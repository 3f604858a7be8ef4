package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("bucketed co-located join runs without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", s"$base/li", buckets = 4, "l_orderkey")
    Bucketing.writeBucketed(ord, "ord_bucketed", s"$base/ord", buckets = 4, "o_orderkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy actually exercises bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Bucketing.readTable(spark, "li_bucketed")
      val b = Bucketing.readTable(spark, "ord_bucketed")
      val joined = a.join(b, a("l_orderkey") === b("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same result as the plain join
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("ensureBucketed re-registers surviving files without rewriting, keeping the exchange-free plan") {
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_buckets_reg").toString
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    def ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.ensureBucketed(spark, li, "li_reg", s"$base/li", 4, "l_orderkey")
      Bucketing.ensureBucketed(spark, ord, "ord_reg", s"$base/ord", 4, "o_orderkey")
      // simulate a fresh session: catalog entry gone, files survive
      spark.sql("DROP TABLE li_reg")
      spark.sql("DROP TABLE ord_reg")
      val mtime = new java.io.File(s"$base/li").lastModified()
      Bucketing.ensureBucketed(spark, li, "li_reg", s"$base/li", 4, "l_orderkey")
      Bucketing.ensureBucketed(spark, ord, "ord_reg", s"$base/ord", 4, "o_orderkey")
      assert(new java.io.File(s"$base/li").lastModified() == mtime,
        "re-register must not rewrite the bucket files")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Bucketing.readTable(spark, "li_reg")
      val b = Bucketing.readTable(spark, "ord_reg")
      val joined = a.join(b, a("l_orderkey") === b("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"re-registered bucketed join shuffles:\n$plan")
      val (liV, ordV) = (li, ord)
      val expected = liV.join(ordV, liV("l_orderkey") === ordV("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_reg")
      spark.sql("DROP TABLE IF EXISTS ord_reg")
    }
  }

  test("ensureBucketed rebuilds when the requested spec differs from the on-disk layout") {
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_buckets_spec").toString
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    try {
      Bucketing.ensureBucketed(spark, li, "li_spec", s"$base/li", 4, "l_orderkey")
      spark.sql("DROP TABLE li_spec")
      // same files on disk, DIFFERENT requested bucket count: registering
      // the 4-bucket files under an 8-bucket spec would silently drop join
      // matches — the layout must be rewritten instead. Detected via the
      // spec sidecar (writeBucketed rewrites it), not directory mtime,
      // which has second-granularity on some filesystems.
      Bucketing.ensureBucketed(spark, li, "li_spec", s"$base/li", 8, "l_orderkey")
      val spec = java.nio.file.Files.readString(
        new java.io.File(s"$base/li", "_graft_bucket_spec").toPath)
      assert(spec.startsWith("8\n"),
        s"spec mismatch must rewrite the layout, sidecar still says: $spec")
      assert(Bucketing.readTable(spark, "li_spec").count() == li.count())
    } finally spark.sql("DROP TABLE IF EXISTS li_spec")
  }
}
