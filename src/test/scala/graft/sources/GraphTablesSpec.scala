package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The materialize-once purchase graph must be a bit-exact stand-in for
  * the inline fact-join derivation it replaced: the five graph queries
  * read the parquet artifact while their DuckDB oracles re-derive the
  * graph from the facts, so any drift here IS an oracle mismatch.
  */
class GraphTablesSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("weighted graph equals a fresh fact-join derivation, both orientations") {
    val got = GraphTables.weightedPurchaseGraph(spark, dir)
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().sorted.toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val e0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy((col("o_custkey") + lit(1000000L)).as("c"),
        col("l_suppkey").as("sup"))
      .agg(count(lit(1)).as("cnt"))
      .select("c", "sup", "cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (e0.map { case (c, s, n) => (c, s, n) } ++
      e0.map { case (c, s, n) => (s, c, n) }).sorted.toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("second call is served from the stamped artifact (no rebuild)") {
    val first = GraphTables.purchaseGraph(spark, dir).count()
    // a rebuild would rewrite the directory; mark it and verify the mark
    // survives the second call. The path is derived with Stamped.stampOf
    // over BOTH source tables — the same key Stamped.ensure builds — so
    // this spec fails loudly if the key convention and the spec ever
    // drift apart again (pre-round-10 it hardcoded the old bare-mtime
    // key and passed only while a stale /tmp dir lingered).
    val stamp = Stamped.stampOf(dir, "lineitem.parquet") + "_" +
      Stamped.stampOf(dir, "orders.parquet")
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val mark = new java.io.File(s"/tmp/graft_purchase_graph_${tag}_$stamp/.spec_mark")
    mark.createNewFile()
    val second = GraphTables.purchaseGraph(spark, dir).count()
    assert(first === second)
    assert(mark.exists(), "second call rebuilt the artifact it should reuse")
    mark.delete()
  }

  test("co-purchase artifact equals a fresh basket-pair derivation") {
    val got = GraphTables.copurchasePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val expected = GraphTables.basketPairsFrom(
        spark.read.parquet(s"$dir/lineitem.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got.nonEmpty)
    assert(got === expected)
    assert(got.forall { case (pa, pb, n) => pa < pb && n >= 1 })
  }

  test("unweighted projection prunes cnt at the scan") {
    val plan = GraphTables.purchaseGraph(spark, dir)
      .queryExecution.executedPlan.toString
    // ReadSchema of the parquet scan must not include cnt
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("src") && read.contains("dst") && !read.contains("cnt"),
      s"cnt not pruned from scan: $read")
  }
}
