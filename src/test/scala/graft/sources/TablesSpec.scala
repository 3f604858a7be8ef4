package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Testdata-drift CANARY (round-4 verdict ask #2). The driver regenerates
  * /root/testdata between rounds and has already shipped events.ts as BOTH
  * parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS); round 4 lost 22 queries
  * to exactly that drift. This suite pins the contract in one named place:
  * whatever the current encoding is, `Tables.events` must analyze, produce
  * a TimestampType ts, and yield sane 2024-range data — so the NEXT
  * regeneration fails here first, not across the query surface.
  */
class TablesSpec extends AnyFunSuite with SparkSuite {

  test("canary: live testdata events reads adaptively and lands in 2024") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"adaptEventTs must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    val years = ev.select(year(col("ts")).as("y"))
      .agg(min("y"), max("y")).head()
    assert(years.getInt(0) >= 2020 && years.getInt(1) <= 2030,
      s"events ts out of sane range [${years.getInt(0)}, ${years.getInt(1)}] — " +
        "testdata ts encoding drifted again (1970 means a raw-int64 misread)")
  }

  test("micros fixture and nanos-long fixture normalize identically") {
    import spark.implicits._
    // one known instant: 2024-03-15T12:00:00.123456Z
    val micros = 1710504000123456L

    // micros path: a real TimestampType column written to parquet round-trips
    // as TIMESTAMP(MICROS) and must pass through unchanged
    val microsDir = Files.createTempDirectory("graft_ts_micros").toString + "/events.parquet"
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(microsDir)
    val viaMicros = Tables.adaptEventTs(spark.read.parquet(microsDir))

    // nanos-long path: the legacy nanosAsLong shape — a LONG ts column
    val nanosDir = Files.createTempDirectory("graft_ts_nanos").toString + "/events.parquet"
    Seq((1L, micros * 1000L)).toDF("event_id", "ts").write.parquet(nanosDir)
    val viaNanos = Tables.adaptEventTs(spark.read.parquet(nanosDir))

    assert(viaMicros.schema("ts").dataType == TimestampType)
    assert(viaNanos.schema("ts").dataType == TimestampType)
    val a = viaMicros.select(unix_micros(col("ts"))).head().getLong(0)
    val b = viaNanos.select(unix_micros(col("ts"))).head().getLong(0)
    assert(a == micros && b == micros,
      s"paths disagree or lose precision: micros-file=$a nanos-file=$b want=$micros")
  }

  test("unexpected ts type is a loud failure, not a silent misread") {
    import spark.implicits._
    val weird = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.adaptEventTs(weird))
    assert(e.getMessage.contains("drifted"))
    // and a frame with LongType must still take the nanos branch (guards
    // against someone "simplifying" the match to TimestampType-only)
    val asLong = Seq((1L, 1710504000123456L * 1000L)).toDF("event_id", "ts")
    assert(asLong.schema("ts").dataType == LongType)
    assert(Tables.adaptEventTs(asLong).schema("ts").dataType == TimestampType)
  }
}
