package graft

import org.scalatest.funsuite.AnyFunSuite

/** Assertions about declared SparkEntry queries that the cross-engine gate
  * cannot express — engine-specific estimates checked against their own
  * exact companions.
  */
class EntryQueriesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_approx_distinct: HLL estimate within 5% of exact per quarter") {
    // rsd is set to 0.02 in the query; 5% is 2.5 sigma — roomy but real.
    // The hash gate skips this query (HLL hashes are engine-specific), so
    // the tolerance claim lives here.
    val rows = SparkEntry.queries("q_approx_distinct")(spark, dir)
      .select("Quarter", "exact_suppliers", "approx_suppliers")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$q: approx=$approx exact=$exact err=$err")
    }
  }

  test("q_scan_xlsx round-trips region through the workbook format") {
    val got = SparkEntry.queries("q_scan_xlsx")(spark, dir)
      .as[(Int, String)].collect().toSeq
    val expected = spark.read.parquet(s"$dir/region.parquet")
      .orderBy("r_regionkey")
      .selectExpr("cast(r_regionkey as int)", "r_name")
      .as[(Int, String)].collect().toSeq
    assert(got == expected && got.size == 5)
  }
}
