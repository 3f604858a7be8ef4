package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev scratchpad: stage-by-stage timing for the query being optimized.
  * Not part of the library surface; contents change per investigation.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup
    t("warmup embed_groups")(
      SparkEntry.queries("q_dedup_embed_groups")(spark, sfDir).count())
    spark.catalog.clearCache()
    // stagewise
    import graft.sim.Similarity
    import graft.text.Dedup
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairsLazy = Similarity.nearDupPairsBanded(spark, emb, threshold = 0.4)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    t("pairs checkpoint")(pairsLazy.localCheckpoint().count())
    val pairs2 = Similarity.nearDupPairsBanded(spark, emb, threshold = 0.4)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    t("dedupGroups")(Dedup.dedupGroups(emb.select("vec_id"), pairs2, "vec_id").count())
    spark.catalog.clearCache()
    t("full query again")(
      SparkEntry.queries("q_dedup_embed_groups")(spark, sfDir).count())
    spark.stop()
  }
}
