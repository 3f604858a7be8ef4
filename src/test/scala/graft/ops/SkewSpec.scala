package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class SkewSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted two-phase aggregation is bit-identical to the direct one") {
    val df = (1 to 20000).map(i => (s"k${i % 3}", i * 0.01 + 1e-9 * i)).toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(Scalar.stableSum($"v").as("sum_value"), count($"v").as("n"))
      .withColumn("avg_value", $"sum_value" / $"n")
      .orderBy("k").as[(String, Double, Long, Double)].collect()
    val salted = Skew.saltedSumCount(df, $"k", $"v", Seq($"v"), salts = 8)
      .orderBy("_key").as[(String, Double, Long, Double)].collect()
    assert(direct.map(_._1).toSeq == salted.map(_._1).toSeq)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d._2 == s._2) // exact decimal accumulation => associative => identical
      assert(d._3 == s._3)
      assert(d._4 == s._4)
    }
  }

  test("approx_count_distinct lands within its error bound on real keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(countDistinct($"l_suppkey").as("exact"),
      approx_count_distinct($"l_suppkey", 0.02).as("approx"))
      .as[(Long, Long)].head()
    assert(math.abs(r._2 - r._1).toDouble / r._1 < 0.05)
  }

  test("saltedEquiJoin is row-identical to the plain join and plans a merge join") {
    val facts = (1 to 5000).map(i => (i.toLong, s"t${i % 3}", i * 0.5))
      .toDF("id", "k", "v")
    val dim = Seq(("t0", 10), ("t1", 20), ("t2", 30)).toDF("k", "attr")
    val salted = Skew.saltedEquiJoin(facts, dim, "k", Seq($"id"), salts = 8)
      .select("id", "k", "v", "attr")
    val plain = facts.join(dim, "k").select("id", "k", "v", "attr")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("salt is deterministic and spans the requested range") {
    val df = (1 to 1000).map(i => i.toLong).toDF("id")
    val salts = df.select(Skew.salt(16, $"id")).as[Int].collect()
    assert(salts.forall(s => s >= 0 && s < 16))
    assert(salts.distinct.length > 8) // actually spreads
    val again = df.select(Skew.salt(16, $"id")).as[Int].collect()
    assert(salts.toSeq == again.toSeq)
  }
}
