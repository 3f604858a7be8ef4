package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The verdict-r4 contract for Verify's failure surface: a broken query
  * must produce a VISIBLE artifact in the output tree (absence must be
  * distinguishable from silence), and healthy queries must dump normally
  * alongside it.
  */
class VerifySpec extends AnyFunSuite with SparkSuite {

  test("an intentionally-broken query leaves a _failed marker with the error") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val out = Files.createTempDirectory("graft_verify").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate spec failure")
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") }
    val failed = Verify.dumpQueries(spark, "/unused", out,
      Map("q_spec_boom" -> boom, "q_spec_ok" -> ok))
    assert(failed == Seq("q_spec_boom"))
    val marker = new java.io.File(s"$out/_failed/q_spec_boom/error.txt")
    assert(marker.exists, "no visible failure artifact")
    val msg = Files.readString(marker.toPath)
    assert(msg.contains("IllegalStateException") &&
      msg.contains("deliberate spec failure"), msg)
    // the healthy query dumped normally next to the marker
    assert(new java.io.File(s"$out/q_spec_ok/_SUCCESS").exists)
    assert(spark.read.parquet(s"$out/q_spec_ok").count() == 1)
    // and no marker dir exists for it
    assert(!new java.io.File(s"$out/_failed/q_spec_ok").exists)
  }
}
