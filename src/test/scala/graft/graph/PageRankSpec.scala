package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** PageRank vs a sequential fixed-point reference interpreter: the
  * distributed join/agg loop must reproduce the exact integer ranks of the
  * obvious single-threaded computation on every graph shape — at the
  * derived unit AND at a forced small unit (the resolution a huge graph
  * would run at).
  */
class PageRankSpec extends AnyFunSuite with SparkSuite {

  /** Sequential reference: same fixed-point update, plain Scala maps,
    * parameterized by the micro-unit like the library. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        unit: Long = PageRank.Unit): Map[Long, Long] = {
    val damping = unit * 85L / 100L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r: Map[Long, Long] = outdeg.map { case (n, _) => n -> unit }
    for (_ <- 1 to iters) {
      val contrib = edges
        .collect { case (s, d) if r.contains(s) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = outdeg.map { case (n, _) =>
        n -> ((unit - damping) + damping * contrib.getOrElse(n, 0L) / unit)
      }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  unitOverride: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), iters, unitOverride)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  private val chain =
    (1L to 6L).sliding(2).flatMap { case Seq(a, b) => Seq(a -> b, b -> a) }.toSeq
  private val star = (2L to 8L).flatMap(i => Seq(1L -> i, i -> 1L))
  private val clique = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield a -> b

  test("matches the sequential reference on a chain, a star, and a clique") {
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

  test("forced small unit (a huge graph's resolution) still matches the reference") {
    // unit=100 is what unitFor derives past ~10^12 nodes: the distributed
    // loop must reproduce the sequential fixed-point arithmetic at that
    // resolution too — same truncation points, same ranks
    for (g <- Seq(chain, star, clique); u <- Seq(100L, 1000L)) {
      val got = run(g, iters = 4, unitOverride = u)
      assert(got === reference(g, iters = 4, unit = u), s"unit=$u on $g")
      assert(got.values.max <= g.size * u, "mass cannot exceed total")
    }
  }

  test("unitFor derives the documented resolution ladder and throws past the floor") {
    // classic unit up to ~2.7e6 nodes; one decade down per ~100x nodes
    assert(PageRank.unitFor(1L) == 1000000L)
    assert(PageRank.unitFor(2700000L) == 1000000L)
    assert(PageRank.unitFor(3000000L) == 100000L)
    assert(PageRank.unitFor(10000000L) == 100000L) // the old hard bound
    assert(PageRank.unitFor(100000000000L) == 1000L) // 10^11: web-graph scale
    assert(PageRank.unitFor(270000000000000L) == 100L)
    intercept[IllegalArgumentException](PageRank.unitFor(300000000000000L))
    // every derived unit really is safe: worst-case damping multiply fits
    for (n <- Seq(1L, 1000L, 2700000L, 3000000L, 100000000000L)) {
      val u = PageRank.unitFor(n)
      assert(BigInt(u) * 85L / 100L * u * n <= BigInt(Long.MaxValue))
    }
  }

  test("the emitted unit column is the derived constant") {
    import spark.implicits._
    val units = PageRank.ranks(chain.toDF("src", "dst"), iters = 1)
      .select("unit").distinct().as[Long].collect()
    assert(units.toSeq == Seq(PageRank.Unit)) // 6 nodes -> classic 1e6
  }
}
