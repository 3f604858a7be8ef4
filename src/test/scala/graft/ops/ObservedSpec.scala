package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The Observation API must deliver pipeline health metrics from the SAME
  * job that computes the result — no second scan.
  */
class ObservedSpec extends AnyFunSuite with SparkSuite {

  test("health metrics ride the action that computes the result") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val expected = orders.count()
    // observe on the PRE-filter frame: the metrics see every scanned row,
    // while the result only keeps the filtered slice — one job, both facts
    val (observed, obs) =
      Observed.withHealthMetrics(orders, Seq("o_custkey", "o_orderstatus"))
    val kept = observed.filter(col("o_orderstatus") === "O").count()
    val m = obs.get
    assert(m("n_rows") == expected, "metrics must count pre-filter rows")
    assert(kept < expected, "the filter must actually drop rows")
    assert(m("o_custkey_nulls") == 0L && m("o_orderstatus_nulls") == 0L)
  }
}
