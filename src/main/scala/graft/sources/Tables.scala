package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table readers. Always explicit paths + parquet-native schemas —
  * scans stay prunable/pushdown-able (BASELINE.md design consequences).
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` is written with TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * (legacy conf — runtime-settable) and rebuild a proper TimestampType
    * column; the data carries no sub-microsecond values, so `div 1000` is
    * lossless and matches DuckDB's TIMESTAMP view of the same file.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
