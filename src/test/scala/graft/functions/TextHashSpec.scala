package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.text.TextOps

class TextHashSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("codegen portable_hash equals the declarative reference over real tokens") {
    TextHash.register(spark)
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
    val diff = toks
      .select(TextOps.portableHash($"w").as("ref"), TextHash.portableHash($"w").as("fast"))
      .filter($"ref" =!= $"fast")
    assert(diff.count() == 0)
  }

  test("known values, empty string, and null propagation") {
    TextHash.register(spark)
    val got = Seq(Some("hello"), Some(""), None).toDF("w")
      .select(TextHash.portableHash($"w")).as[Option[Long]].collect().toSeq
    // 'hello' = fold over code points 104,101,108,108,111 base 31 mod 2^31-1
    assert(got == Seq(Some(99162322L), Some(0L), None))
  }

  test("mixedOf over the codegen hash equals mixedHash over the reference") {
    TextHash.register(spark)
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
    val diff = toks.select(
        TextOps.mixedHash($"w").as("ref"),
        TextOps.mixedOf(TextHash.portableHash($"w")).as("fast"))
      .filter($"ref" =!= $"fast")
    assert(diff.count() == 0)
  }
}
