package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table readers. Always explicit paths + parquet-native schemas —
  * scans stay prunable/pushdown-able (BASELINE.md design consequences).
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to a proper TimestampType regardless
    * of how the parquet writer encoded it — the testdata generator has
    * shipped BOTH encodings across driver regenerations (round 4 broke on
    * exactly this drift), so the reader adapts instead of assuming:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright
    *    (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong
    *    =true` (set at SESSION CONSTRUCTION — GraftSession.builder and the
    *    driver mains; a read-path `conf.set` here would silently change how
    *    every later parquet read decodes nano timestamps, ADVICE r1). The
    *    column then arrives as a nanos LONG and is rebuilt; the data carries
    *    no sub-microsecond values, so `div 1000` is lossless and matches
    *    DuckDB's TIMESTAMP view of the same file.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ (Spark 4 infers NTZ by default). The session runs
    *    with spark.sql.session.timeZone=UTC, so the cast to TimestampType
    *    is a lossless identity on the stored micros and downstream code
    *    (watermarks, session_window, quarter keys) sees the exact type the
    *    nanos branch produces.
    *  - TimestampType already: pass through.
    *
    * One shared entry point for BATCH AND STREAM paths (EventStreams probes
    * the feed footer and funnels through here) so the two can never drift.
    */
  def adaptEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // nanos-as-long rebuild
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts arrived as unexpected type $other — testdata drifted again; " +
        "extend Tables.adaptEventTs (and its TablesSpec canary) for the new encoding")
  }

  /** The events fact table with `ts` normalized to TimestampType — see
    * [[adaptEventTs]] for the encoding drift this absorbs.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    adaptEventTs(table(s, dir, "events"))
}
