package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list (SURVEY.md §2.9 X4-adjacent:
  * link-graph centrality is the standard quality prior of web-corpus
  * pipelines — Common Crawl ranks hosts exactly this way before sampling
  * training documents).
  *
  * Fixed-point INTEGER arithmetic throughout: ranks are BIGINT micro-units
  * (1e6 = unit mass), per-edge contributions are `rank div outdeg`, and the
  * damping update is `150000 + (850000 * Σcontrib) div 1000000`. Integer
  * division truncates identically in Spark (`div`) and ANSI SQL (`//` in
  * DuckDB) for non-negative operands, so every iteration is bit-identical
  * cross-engine — the same trick that keeps the dedup hashes and the Gram
  * matrix oracle-checkable, applied to an iterative algorithm. (Float
  * PageRank would diverge across partitionings: double sums are
  * combine-order-dependent.)
  *
  * Shape for 100 TB: the edge⋈outdeg join is precomputed ONCE and cached —
  * each iteration touches only (id, rank) against it: one equi-join on the
  * source id and one aggregation shuffle on the destination id, both
  * map-side combinable. `localCheckpoint` per round keeps the plan
  * constant-depth (same rationale as Dedup.dedupGroups); the driver never
  * sees a row. Overflow headroom: a single node's incoming contribution
  * is bounded by TOTAL mass n·[[Unit]], so the damping multiply
  * `DampingMicro · contrib` must stay below 2^63 — on hub-heavy graphs
  * (a star pulls nearly all mass into one node) that binds at n ≈ 10^7
  * nodes at the default micro-unit. Beyond that, shrink [[Unit]] (ranks
  * only need enough resolution to order nodes) — the session runs ANSI
  * mode, so an overflow THROWS rather than silently corrupting ranks.
  *
  * Dangling mass is NOT redistributed (the "weak PageRank" variant): nodes
  * are the sources of `edges`, and a node's rank drains if its out-edges
  * point at sink-only nodes. Callers ranking an undirected graph — the
  * common corpus case — pass the symmetrized edge list, where the variant
  * coincides with the classic one up to the dangling term.
  */
object PageRank {

  /** Micro-units per unit of rank mass. */
  val Unit: Long = 1000000L

  /** Damping factor in micro-units (0.85). */
  val DampingMicro: Long = 850000L

  /** Rank every node that has at least one out-edge in `edges`
    * (columns `src`, `dst`) after `iters` damped iterations.
    * Returns (id, r) with r in micro-units.
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters: at least one iteration")
    val base = Unit - DampingMicro
    // the caller's edge build (often a scan+join+distinct) has TWO
    // consumers here — cache it so it runs once, released as soon as the
    // static per-edge table below is materialized
    val e = edges.cache()
    // eager checkpoint: deg anchors every iteration's node-universe left
    // join AND the rank init — left lazy, each of those re-runs the whole
    // upstream edge-build lineage per iteration
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    // static denominators: the per-edge (src, dst, outdeg) table is fixed
    // across iterations — join it once, cache, release when done
    val pre = e.join(deg, "src").cache()
    try {
      pre.count()
      e.unpersist()
      var ranks = deg.select(col("src").as("id"), lit(Unit).as("r")).localCheckpoint()
      for (_ <- 1 to iters) {
        val contribs = pre.join(ranks, pre("src") === ranks("id"))
          .groupBy(col("dst")).agg(sum(expr("r div outdeg")).as("contrib"))
        // left join back to the node universe: a node receiving no mass
        // this round still keeps its base rank (and its out-contributions
        // next round) instead of silently dropping out of the table
        ranks = deg.select(col("src").as("id"))
          .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit(base) +
              expr(s"($DampingMicro * coalesce(contrib, cast(0 as bigint))) div $Unit"))
              .as("r"))
          .localCheckpoint()
      }
      ranks
    } finally { pre.unpersist(); e.unpersist() } // both idempotent; e is
    // normally already released right after pre materializes
  }
}
