package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.ops.Scalar

class QuarterKeyPushdownSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quarter-key equality is rewritten to a pushable timestamp range") {
    QuarterKeyPushdown.install(spark)
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .filter(Scalar.toQuarter(col("o_orderdate")) === "1996-Q2")
    val physical = df.queryExecution.executedPlan.toString
    // the scan must receive raw o_orderdate bounds, not an opaque concat
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(o_orderdate") &&
      physical.contains("LessThan(o_orderdate"),
      s"no pushed range filter in plan:\n$physical")
  }

  test("rewritten filter returns exactly the rows the un-rewritten filter does") {
    QuarterKeyPushdown.install(spark)
    val base = spark.read.parquet(s"$dir/orders.parquet")
    val rewritten = base.filter(Scalar.toQuarter(col("o_orderdate")) === "1996-Q2")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    // same predicate kept opaque (rule can't see through the substring trick)
    val opaque = base
      .filter(substring(Scalar.toQuarter(col("o_orderdate")), 0, 99) === "1996-Q2")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(rewritten == opaque)
    assert(rewritten.nonEmpty)
  }

  test("IN lists and ordered comparisons rewrite and agree with opaque evaluation") {
    QuarterKeyPushdown.install(spark)
    val base = spark.read.parquet(s"$dir/orders.parquet")
    def opaque(c: org.apache.spark.sql.Column) = substring(c, 0, 99)
    val qk = Scalar.toQuarter(col("o_orderdate"))

    val inRewritten = base.filter(qk.isin("1995-Q1", "1997-Q3"))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val inOpaque = base.filter(opaque(qk).isin("1995-Q1", "1997-Q3"))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(inRewritten == inOpaque && inRewritten.nonEmpty)

    for (op <- Seq(">=", ">", "<", "<=")) {
      val lit = "1996-Q2"
      val rewritten = base
        .filter(op match {
          case ">=" => qk >= lit; case ">" => qk > lit
          case "<" => qk < lit; case "<=" => qk <= lit
        })
        .select("o_orderkey").as[Long].collect().sorted.toSeq
      val opq = base
        .filter(op match {
          case ">=" => opaque(qk) >= lit; case ">" => opaque(qk) > lit
          case "<" => opaque(qk) < lit; case "<=" => opaque(qk) <= lit
        })
        .select("o_orderkey").as[Long].collect().sorted.toSeq
      assert(rewritten == opq && rewritten.nonEmpty, s"mismatch for op $op")
    }
  }

  test("TimestampType bounds follow the session timezone, not hardcoded UTC") {
    QuarterKeyPushdown.install(spark)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Bangkok")
      // 1996-04-01 00:30 Bangkok = 1996-03-31 17:30 UTC: in Q2 for this
      // session, but a UTC-computed lower bound would exclude it.
      val df = Seq("1996-03-31 23:30:00", "1996-04-01 00:30:00").toDF("s")
        .select(col("s"), to_timestamp(col("s")).as("ts"))
      val qk = Scalar.toQuarter(col("ts"))
      val rewritten = df.filter(qk === "1996-Q2").select("s").as[String].collect().toSeq
      val opaque = df.filter(substring(qk, 0, 99) === "1996-Q2")
        .select("s").as[String].collect().toSeq
      assert(rewritten == Seq("1996-04-01 00:30:00"))
      assert(rewritten == opaque)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("malformed or pre-1000 literals are not rewritten (semantics preserved)") {
    QuarterKeyPushdown.install(spark)
    val base = spark.read.parquet(s"$dir/orders.parquet")
    assert(base.filter(Scalar.toQuarter(col("o_orderdate")) === "garbage").count() == 0)
    assert(base.filter(Scalar.toQuarter(col("o_orderdate")) === "0999-Q1").count() == 0)
  }
}
