package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (BASELINE.json scale
  * directive: "co-locate joins via bucketing or pre-partitioning").
  *
  * Writing both fact tables bucketed+sorted on the join key means a later
  * join reads bucket i against bucket i directly — NO shuffle exchange at
  * query time. On a 100 TB fact-to-fact join the exchange is the dominant
  * cost; bucketing moves it one-time into the write.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keyCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  def readTable(s: SparkSession, table: String): DataFrame = s.table(table)
}
