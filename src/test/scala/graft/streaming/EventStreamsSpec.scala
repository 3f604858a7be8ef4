package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.ops.Scalar
import graft.sources.Tables

class EventStreamsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Streaming file sources consume directories; stage the single-file
    * events table as a one-file feed dir.
    */
  private lazy val feedDir: String = {
    import java.nio.file.{Files, Paths}
    val d = Files.createTempDirectory("graft_feed")
    Files.createSymbolicLink(d.resolve("batch0.parquet"),
      Paths.get(s"$dir/events.parquet"))
    d.toString
  }

  test("streaming quarterly roll-up agrees with the batch aggregation") {
    val stream = EventStreams.quarterlyValues(EventStreams.readEventStream(spark, feedDir))
    val got = EventStreams.runToCompletion(spark, stream, "quarterly_stream")
      .orderBy("Quarter").as[(String, Long, Double)].collect()
    val expected = Tables.events(spark, dir)
      .groupBy(Scalar.toQuarter(col("ts")).as("Quarter"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .orderBy("Quarter").as[(String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == expected.map(r => (r._1, r._2)).toSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9)
    }
  }

  test("windowed watermark aggregation produces hourly per-type counts") {
    val stream = EventStreams.hourlyTypeCounts(EventStreams.readEventStream(spark, feedDir))
    val got = EventStreams.runToCompletion(spark, stream, "hourly_stream")
    assert(got.count() > 0)
    // total events across windows == table size
    val total = got.agg(sum("n")).as[Long].head()
    assert(total == Tables.events(spark, dir).count())
  }

  test("stream-stream interval join matches the batch interval join") {
    val stream = EventStreams.purchaseAttribution(EventStreams.readEventStream(spark, feedDir))
    val got = EventStreams.runToCompletion(spark, stream, "attrib_stream",
      OutputMode.Append)
      .select("purchase_id", "view_id").as[(Long, Long)].collect().sorted.toSeq
    val expected = EventStreams.purchaseAttribution(Tables.events(spark, dir))
      .select("purchase_id", "view_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming dedup collapses a doubled feed back to the table size") {
    import java.nio.file.{Files, Paths}
    val d = Files.createTempDirectory("graft_feed_dup")
    Files.createSymbolicLink(d.resolve("batch0.parquet"), Paths.get(s"$dir/events.parquet"))
    Files.createSymbolicLink(d.resolve("batch1.parquet"), Paths.get(s"$dir/events.parquet"))
    val deduped = EventStreams.dedupStream(EventStreams.readEventStream(spark, d.toString))
    val got = EventStreams.runToCompletion(spark, deduped, "dedup_stream",
      OutputMode.Append)
    assert(got.count() == Tables.events(spark, dir).count())
    assert(got.select(countDistinct("event_id")).as[Long].head() == got.count())
  }

  test("session windows under a watermark agree with the batch sessionization") {
    val streamed = EventStreams.sessionWindowAgg(
      EventStreams.readEventStream(spark, feedDir).withWatermark("ts", "1 hour"),
      "5 minutes")
    val got = EventStreams.runToCompletion(spark, streamed, "session_stream",
        OutputMode.Append)
      .orderBy("user_id", "session_start")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect()
    val batch = EventStreams.sessionWindowAgg(
        Tables.events(spark, dir).select("user_id", "ts", "value"), "5 minutes")
      .orderBy("user_id", "session_start")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect()
    // append mode only emits sessions finalized by the LAST watermark
    // (max event time - 1h); sessions ending inside that lag stay in state
    val maxTs = Tables.events(spark, dir).agg(max("ts"))
      .collect().head.getTimestamp(0).getTime
    val cutoff = maxTs - 3600L * 1000
    val emittable = batch.filter(_._3.getTime <= cutoff)
    assert(got.toSeq == emittable.toSeq)
    assert(batch.length - emittable.length <= 5) // only the tail is held back
  }

  test("stateful sessionization emits one summary per user with sane bounds") {
    val sess = EventStreams.sessionize(spark,
      EventStreams.readEventStream(spark, feedDir))
    val got = EventStreams.runToCompletion(spark, sess.toDF(), "sessions",
      OutputMode.Update).as[(Long, Int, Long)].collect()
    val users = Tables.events(spark, dir).select(countDistinct("user_id")).as[Long].head()
    assert(got.length == users)
    assert(got.forall(_._2 > 0))
    assert(got.forall(_._3 >= 0))
  }
}
