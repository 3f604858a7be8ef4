package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: band-bucket occupancy skew of the BoVW banded
  * probe at a synthetic decade dir (runMain graft.tools.BucketSkew <dir>).
  */
object BucketSkew {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val feat = graft.multimodal.Media.bovwFeatures(spark, docs).localCheckpoint()
    val n = feat.count()
    val rows = math.max(4, graft.sim.Similarity.adaptiveRowsPerBand(n, base = 4))
    val pl = graft.sim.Similarity.portablePlanes(8 * rows, 64)
    val bd = graft.sim.Similarity.withLshBuckets(feat, pl, 8)
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("band", "bkt")))
    val occ = bd.groupBy("band", "bkt").agg(count(lit(1)).as("n")).cache()
    val stats = occ.agg(max("n").as("max"), expr("percentile(n, 0.99)").as("p99"),
      expr("percentile(n, 0.5)").as("p50"), count(lit(1)).as("buckets")).collect()(0)
    val pairs = occ.agg(sum(expr("n * (n - 1) / 2")).as("pairs")).collect()(0)
    println(s"[skew] n=$n rowsPerBand=$rows expectedOcc=${n / (1L << rows)} " +
      s"maxOcc=${stats.get(0)} p99=${stats.get(1)} p50=${stats.get(2)} " +
      s"buckets=${stats.get(3)} candidatePairs=${pairs.get(0)}")
    spark.stop()
  }
}
