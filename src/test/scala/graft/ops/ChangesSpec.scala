package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class ChangesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("scd2: contiguous half-open intervals, one current version per key") {
    val log = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.0),
      (1L, 11L, "2024-02-01 00:00:00", 2.0),
      (1L, 12L, "2024-03-01 00:00:00", 3.0),
      (2L, 20L, "2024-01-15 00:00:00", 9.0)
    ).toDF("user_id", "event_id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

    val dim = Changes.scd2(log, "user_id", "ts", "event_id")
      .orderBy("user_id", "version")
      .select("user_id", "version", "valid_from", "valid_to", "is_current")
      .collect()

    // versions 1..n per key, exactly one open (current) interval
    val byUser = dim.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
      assert(rows.count(_.getBoolean(4)) == 1)
      assert(rows.last.getBoolean(4)) // the latest version is the current one
      // interval chaining: row k's valid_to == row k+1's valid_from
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getTimestamp(3) == b.getTimestamp(2))
        case _ =>
      }
    }
  }

  test("scd2: same-timestamp changes version deterministically by tie-break") {
    val ts = to_timestamp(lit("2024-01-01 00:00:00"))
    val log = Seq((1L, 5L), (1L, 3L)).toDF("user_id", "event_id")
      .withColumn("ts", ts)
    val versions = Changes.scd2(log, "user_id", "ts", "event_id")
      .orderBy("version").select("event_id").as[Long].collect()
    assert(versions.toSeq == Seq(3L, 5L)) // lower tie-break gets version 1
  }

  test("cdcMerge: latest-wins update, delete, insert, passthrough") {
    val base = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status")
    val changes = Seq(
      (1L, 1L, "U", 11.0, "A1"), // two updates to key 1: seq 2 wins
      (1L, 2L, "U", 12.0, "A2"),
      (2L, 1L, "D", 0.0, ""),    // delete key 2
      (9L, 1L, "I", 90.0, "I9")  // insert fresh key 9
    ).toDF("k", "seq", "op", "price", "status")

    val out = Changes.cdcMerge(base, changes, "k", "seq", "op",
        Seq("price", "status"))
      .orderBy("k").as[(Long, Double, String)].collect()

    assert(out.toSeq == Seq(
      (1L, 12.0, "A2"), // latest update won
      (3L, 30.0, "C"),  // untouched base row passes through
      (9L, 90.0, "I9")  // insert landed; key 2 deleted
    ))
  }

  test("cdcMerge: equal-seq changes resolve deterministically by tie-break") {
    val base = Seq((1L, 0.0)).toDF("k", "v")
    // same key, same seq, shuffled into many partitions: without a
    // tie-break the winner would be partitioning luck
    val changes = Seq((1L, 7L, "U", 1.0, 3L), (1L, 7L, "U", 2.0, 9L),
        (1L, 7L, "U", 3.0, 1L))
      .toDF("k", "seq", "op", "v", "src_part").repartition(8)
    val out = Changes.cdcMerge(base, changes, "k", "seq", "op", Seq("v"),
      tieBreak = "src_part").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2.0))) // highest tie-break (src_part=9) wins
  }

  test("cdcMerge: delete of an absent key is a no-op") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val changes = Seq((42L, 1L, "D", 0.0)).toDF("k", "seq", "op", "v")
    val out = Changes.cdcMerge(base, changes, "k", "seq", "op", Seq("v"))
      .as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1.0)))
  }
}
