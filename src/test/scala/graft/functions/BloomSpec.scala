package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class BloomSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every inserted key passes the filter") {
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey").distinct()
    val bloom = Bloom.buildFilter(dim, "o_orderkey", 10000L)
    val dropped = dim
      .filter(!Bloom.mightContain(spark, bloom, col("o_orderkey")))
      .count()
    assert(dropped == 0)
  }

  test("bloom-pruned semi-join equals the exact semi-join") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val bloom = Bloom.buildFilter(dim, "o_orderkey", 10000L)

    val pruned = lineitem
      .filter(Bloom.mightContain(spark, bloom, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val exact = lineitem
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")

    assert(pruned.count() == exact.count())
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("the filter actually prunes: selectivity below 1 on disjoint keys") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val bloom = Bloom.buildFilter(dim, "k", 100L)
    val probe = spark.range(1000000, 1010000).toDF("k")
    val passed = probe.filter(Bloom.mightContain(spark, bloom, col("k"))).count()
    // default fpp is ~3%; allow a generous margin while proving real pruning
    assert(passed < 1000, s"bloom passed $passed of 10000 disjoint keys")
  }
}
