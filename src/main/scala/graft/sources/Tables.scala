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
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at SESSION
    * CONSTRUCTION — GraftSession.builder and the driver mains; a read-path
    * `conf.set` here would silently change how every later parquet read in
    * the session decodes nano timestamps, ADVICE r1) the column arrives as
    * a nanos long and is rebuilt into a proper TimestampType; the data
    * carries no sub-microsecond values, so `div 1000` is lossless and
    * matches DuckDB's TIMESTAMP view of the same file.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.builder " +
        "does) — without it the scan fails with an opaque PARQUET_TYPE_ILLEGAL")
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
