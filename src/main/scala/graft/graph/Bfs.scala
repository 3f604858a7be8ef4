package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS hop distances over an edge list — the graph suite's
  * reachability member next to PageRank (mass), triangles (local
  * structure), and connected components (global structure). Distances are
  * exact BIGINTs, so the whole computation replays in an unrolled SQL
  * oracle (the PageRank discipline; no floats anywhere).
  *
  * FRONTIER formulation, not dist-table self-join: round k expands only
  * the nodes FIRST REACHED at round k-1 (`frontier ⋈ edges`, then
  * anti-join against everything already settled), so each edge is
  * traversed once per endpoint discovery — total work O(E) over the whole
  * run, the textbook distributed BFS. A naive `dist ⋈ edges` per round
  * re-expands the entire reached set every round — O(E·depth) — which is
  * the difference between a 6-round web-graph BFS finishing and not, at
  * 100 TB. The settled set is union-appended and localCheckpoint'd per
  * round (constant-depth plan, same as PageRank's ranks).
  *
  * Returns (id, d): every node within `maxHops` of `seed`, d = exact
  * hop distance (min over paths — the anti-join guarantees first-reach,
  * and BFS first-reach IS the minimum in an unweighted graph).
  */
object Bfs {

  def hops(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops")
    val e = edges.select(col("src"), col("dst"))
    var settled = e.sparkSession.range(1).select(
      lit(seed).as("id"), lit(0L).as("d")).localCheckpoint()
    var frontier = settled.select("id")
    var round = 0
    while (round < maxHops) {
      round += 1
      val next = e.join(frontier, e("src") === frontier("id"))
        .select(col("dst").as("id")).distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(round.toLong).as("d"))
        .localCheckpoint()
      settled = settled.union(next).localCheckpoint()
      frontier = next.select("id")
    }
    settled
  }
}
