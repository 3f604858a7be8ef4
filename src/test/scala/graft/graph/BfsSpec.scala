package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class BfsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("hops on a path-plus-branch graph are exact and depth-bounded") {
    // 1→2→3→4→5 with a shortcut 1→4 and an unreachable island 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("src", "dst")
    val d = Bfs.hops(edges, seed = 1L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut wins: 4 is at hop 1, 5 at hop 2; 3 via 2 at hop 2
    assert(d == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // depth bound honored and islands never reached
    val d1 = Bfs.hops(edges, seed = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("a cycle settles each node once at its first reach") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rows = Bfs.hops(edges, seed = 1L, maxHops = 5).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("cheapest paths improve after first reach (why BFS's frontier trick can't apply)") {
    // direct 1→3 costs 10; the longer 1→2→3 path costs 2 — node 3's cost
    // must DROP from 10 to 2 once the second round relaxes through 2
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val one = Bfs.cheapest(edges, seed = 1L, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    val full = Bfs.cheapest(edges, seed = 1L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
