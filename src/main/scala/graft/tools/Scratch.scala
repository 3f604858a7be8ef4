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

    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_embed_groups", "q_dedup_keep_best")
    for (round <- 1 to 4; name <- names) {
      t(s"$name r$round")(SparkEntry.queries(name)(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
