package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class ScalarSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("quarterSwap reorders Qx/YYYY to YYYY-Qx (src:63-67 reformat_quarter)") {
    val got = Seq("Q2/2025", "Q4/2013", "noise").toDF("q")
      .select(Scalar.quarterSwap($"q")).as[String].collect()
    assert(got.toSeq == Seq("2025-Q2", "2013-Q4", "noise"))
  }

  test("stripRevision drops p/r/p1/r1 suffixes with whitespace (src:134,385)") {
    // note: like the reference's regex, a bare trailing p/r is stripped even
    // from ordinary words ("keep" -> "kee") — headers never hit this, but it
    // is the reference's exact semantics (src:134 r'\s*[pr]$')
    val got = Seq("2025p1", "Q2r", "Q1/2013 p", "2024", "keep").toDF("v")
      .select(Scalar.stripRevision($"v")).as[String].collect()
    assert(got.toSeq == Seq("2025", "Q2", "Q1/2013", "2024", "kee"))
  }

  test("deComma parses comma-grouped integers (src:173)") {
    val got = Seq("106,371", "1,234,567", "42").toDF("v")
      .select(Scalar.deComma($"v")).as[Long].collect()
    assert(got.toSeq == Seq(106371L, 1234567L, 42L))
  }

  test("pctToRatio divides by 100 (src:169)") {
    val got = Seq("2.34", "-0.53").toDF("v")
      .select(Scalar.pctToRatio($"v")).as[Double].collect()
    assert(math.abs(got(0) - 0.0234) < 1e-12)
    assert(math.abs(got(1) - -0.0053) < 1e-12)
  }

  test("toQuarter formats the universal join key (src:350,438)") {
    val got = Seq("2016-02-29", "2025-10-01").toDF("d")
      .select(Scalar.toQuarter(to_date($"d"))).as[String].collect()
    assert(got.toSeq == Seq("2016-Q1", "2025-Q4"))
  }

  test("stableSum is partitioning-independent (exact decimal accumulation)") {
    val vals = (1 to 10000).map(i => i * 0.1 + 1e-7 * i)
    val one = vals.toDF("v").repartition(1).agg(Scalar.stableSum($"v")).as[Double].head()
    val many = vals.toDF("v").repartition(32).agg(Scalar.stableSum($"v")).as[Double].head()
    assert(one == many) // bit-identical, not approximately equal
  }
}
