package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class AsOfSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinLastBefore picks the most recent right row at or before each left time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // other key, exact-tie match
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 200.0),
      (20L, ts("2024-01-01 12:00:00"), 300.0) // equal timestamp
    ).toDF("k", "t", "v")
    val got = AsOf.joinLastBefore(left, right, Seq("k"), "t", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, Some(100.0)), // 10:00 -> 09:30 row
      (2L, Some(200.0)), // 12:00 -> 11:00 row
      (3L, None),        // nothing at or before 09:00
      (4L, Some(300.0))  // >= semantics: equal instant matches
    ))
  }

  test("right rows never leak into the output") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "t", "v")
    val got = AsOf.joinLastBefore(left, right, Seq("k"), "t", Seq("v"))
    assert(got.count() == 1)
  }
}
