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

  test("q_token_entropy closed forms: uniform terms hit log2(k), repeated term hits 0") {
    import org.apache.spark.sql.functions._
    // Build a scratch documents table with known distributions and run the
    // same expression pipeline the declared query uses.
    val docs = Seq(
      (0L, "a b c d"),        // 4 distinct terms, uniform => H = log2(4) = 2
      (1L, "x x x x"),        // single term => H = 0
      (2L, "a a b b")         // 2 terms uniform => H = 1
    ).toDF("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val n = sum(col("c")).cast("double")
    val got = tf.groupBy("doc_id")
      .agg(round((log(n) - sum(col("c").cast("double") * log(col("c").cast("double"))) / n)
        / log(lit(2.0)), 6).as("entropy"))
      .orderBy("doc_id").select("entropy").as[Double].collect().toSeq
    assert(got == Seq(2.0, 0.0, 1.0))
  }

  test("q_ewma_daily matches the sequential recursion per event_type") {
    val rows = SparkEntry.queries("q_ewma_daily")(spark, dir)
      .select("event_type", "n", "ewma")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, seq) =>
      // query output is ordered (event_type, day); groupBy preserves the
      // per-type slice order, so fold the counts sequentially
      var acc = Double.NaN
      seq.foreach { case (_, nDaily, ewma) =>
        acc = if (acc.isNaN) nDaily.toDouble else acc * 0.75 + nDaily * 0.25
        assert(math.abs(ewma - acc) < 1e-9, s"ewma=$ewma expected=$acc")
      }
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
