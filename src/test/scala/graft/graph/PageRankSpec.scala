package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** PageRank vs a sequential fixed-point reference interpreter: the
  * distributed join/agg loop must reproduce the exact integer ranks of the
  * obvious single-threaded computation on every graph shape.
  */
class PageRankSpec extends AnyFunSuite with SparkSuite {

  /** Sequential reference: same fixed-point update, plain Scala maps. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r: Map[Long, Long] = outdeg.map { case (n, _) => n -> PageRank.Unit }
    for (_ <- 1 to iters) {
      val contrib = edges
        .collect { case (s, d) if r.contains(s) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = outdeg.map { case (n, _) =>
        n -> ((PageRank.Unit - PageRank.DampingMicro) +
          PageRank.DampingMicro * contrib.getOrElse(n, 0L) / PageRank.Unit)
      }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("matches the sequential reference on a chain, a star, and a clique") {
    val chain = (1L to 6L).sliding(2).flatMap { case Seq(a, b) => Seq(a -> b, b -> a) }.toSeq
    val star = (2L to 8L).flatMap(i => Seq(1L -> i, i -> 1L))
    val clique = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield a -> b
    for (g <- Seq(chain, star, clique); iters <- Seq(1, 3, 5))
      assert(run(g, iters) === reference(g, iters), s"iters=$iters on $g")
  }

  test("a 2-node symmetric pair is a fixed point at exactly unit mass") {
    val r = run(Seq(1L -> 2L, 2L -> 1L), iters = 7)
    assert(r === Map(1L -> PageRank.Unit, 2L -> PageRank.Unit))
  }

  test("asymmetric graph: sinks drain mass, hubs accumulate it") {
    // 1..4 all point at 5; 5 points only at 1 — 5 is the hub
    val g = (1L to 4L).map(_ -> 5L) :+ (5L -> 1L)
    val r = run(g, iters = 4)
    assert(r === reference(g, iters = 4))
    assert(r(5L) > r(2L), "hub must outrank leaves")
  }
}
