package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Dev scratchpad: repeated warm timings for the queries under
  * investigation (`runMain graft.tools.Scratch <sfDir> [query...]`).
  * Not part of the library surface.
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

    if (args.length > 1 && args(1) == "hotcap_stages") {
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        val corpus = graft.entry.TextSimQueries.hotCapCorpus(spark, sfDir)
        val feat = graft.multimodal.Media.bovwFeatures(spark, corpus).localCheckpoint()
        val t1 = System.nanoTime()
        val cap = (feat.count() / 5).toInt
        val t2 = System.nanoTime()
        val hot = graft.sim.Similarity.hotBuckets(feat, numPlanes = 48,
          bands = 8, maxBucketDf = cap).localCheckpoint()
        val t3 = System.nanoTime()
        val hits = graft.sim.Similarity.semanticMatches(spark, feat,
            queryPred = col("vec_id") >= 30000000L && col("vec_id") < 60000000L,
            threshold = 0.6, numPlanes = 48, bands = 8,
            maxBucketDf = cap, broadcastQueries = true, hotKeys = hot)
          .filter(col("vec_id") < 30000000L)
        val nh = hits.count()
        val t4 = System.nanoTime()
        hits.count() // same QueryExecution: planning already done
        val t5 = System.nanoTime()
        def s(a: Long, b: Long): String = f"${(b - a) / 1e9}%6.2f"
        println(s"[scratch] r$round feat=${s(t0, t1)} count=${s(t1, t2)} " +
          s"hot=${s(t2, t3)} matches=${s(t3, t4)} rerun=${s(t4, t5)} hits=$nh cap=$cap")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_embed_groups", "q_dedup_keep_best")
    for (round <- 1 to 4; name <- names) {
      t(s"$name r$round")(SparkEntry.queries(name)(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
