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
  * Shape for 100 TB: the edge⋈outdeg join is precomputed ONCE and cached
  * clustered+sorted on src — each iteration sort-merge-joins only the
  * node-sized (id, rank) table against it (the cached partitioning and
  * ordering are reused, so the edge-sized side never re-exchanges or
  * re-sorts) and runs one aggregation shuffle on the destination id, both
  * map-side combinable. `localCheckpoint` per round keeps the plan
  * constant-depth (same rationale as Dedup.dedupGroups); the driver never
  * sees a row. Overflow headroom: a single node's incoming contribution
  * is bounded by TOTAL mass n·unit, so the damping multiply
  * `damping · contrib` must stay below 2^63 — on hub-heavy graphs
  * (a star pulls nearly all mass into one node) that binds at n ≈ 10^6.5
  * nodes at the classic 1e6 micro-unit. The unit is therefore DERIVED
  * from the ranked-node count ([[unitFor]]): the largest power-of-ten
  * resolution whose worst-case damping multiply keeps 4× headroom under
  * 2^63 — a 100 TB link graph (10^10..10^11 nodes) lands at unit 1000,
  * still ample resolution for ordering nodes, and the floor of unit 100
  * carries ~10^14 nodes. The session runs ANSI mode, so if the bound is
  * ever wrong an overflow THROWS rather than silently corrupting ranks.
  * The chosen unit is emitted as a constant `unit` column — fixed-point
  * ranks are meaningless without their scale, and a cross-engine replay
  * must bake the same constants into its arithmetic.
  *
  * Dangling mass is NOT redistributed (the "weak PageRank" variant): nodes
  * are the sources of `edges`, and a node's rank drains if its out-edges
  * point at sink-only nodes. Callers ranking an undirected graph — the
  * common corpus case — pass the symmetrized edge list, where the variant
  * coincides with the classic one up to the dangling term.
  */
object PageRank {

  /** Classic (maximum) micro-units per unit of rank mass — the resolution
    * used whenever the graph is small enough to afford it. */
  val Unit: Long = 1000000L

  /** Damping factor 0.85 at the classic unit. */
  val DampingMicro: Long = 850000L

  /** Smallest unit [[unitFor]] will derive: 0.85·100 is still exact, and
    * the worst-case multiply 0.85·100·n·100 holds to n ≈ 2.7·10^14 nodes. */
  val MinUnit: Long = 100L

  /** The damping multiply's worst case is `0.85·unit · n·unit` (a star
    * graph pulls ~all mass into one node); `safe` keeps it ≤ 2^61 — 4×
    * headroom under Long — evaluated in BigInt so the CHECK can't
    * overflow either. */
  private def safeUnit(u: Long, n: Long): Boolean =
    BigInt(u) * u * n * 85L / 100L <= (BigInt(1) << 61)

  /** Largest power-of-ten unit in [[[MinUnit]], [[Unit]]] whose damping
    * multiply cannot overflow with `n` ranked nodes. Throws (rather than
    * degrading resolution below exact-damping territory) past ~2.7·10^14
    * nodes — orders of magnitude beyond any real link graph.
    */
  def unitFor(n: Long): Long = {
    require(n > 0, s"n=$n: need at least one ranked node")
    var u = Unit
    while (u > MinUnit && !safeUnit(u, n)) u /= 10
    require(safeUnit(u, n),
      s"graph of $n nodes exceeds fixed-point headroom even at unit=$MinUnit")
    u
  }

  /** Rank every node that has at least one out-edge in `edges`
    * (columns `src`, `dst`) after `iters` damped iterations.
    * Returns (id, r, unit) with r in micro-units of the derived (or
    * overridden) `unit` — constant per run, emitted because fixed-point
    * ranks are uninterpretable without their scale.
    *
    * `unitOverride` (power of ten, ≥ [[MinUnit]]) forces a resolution —
    * the cross-engine-parity and the simulated-large-graph test hook;
    * leave 0 to derive it from the node count.
    */
  def ranks(edges: DataFrame, iters: Int, unitOverride: Long = 0L): DataFrame = {
    require(iters >= 1, s"iters=$iters: at least one iteration")
    // the caller's edge build (often a scan+join+distinct) has TWO
    // consumers here — cache it so it runs once, released as soon as the
    // static per-edge table below is materialized
    val e = edges.cache()
    // eager checkpoint: deg anchors every iteration's node-universe left
    // join AND the rank init — left lazy, each of those re-runs the whole
    // upstream edge-build lineage per iteration
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    // node count for the unit derivation: deg is materialized, so this is
    // a metadata-cheap job, not a second edge scan
    val unit = if (unitOverride > 0L) unitOverride else unitFor(deg.count())
    val damping = unit * 85L / 100L
    val base = unit - damping
    require(damping * 100L / 85L == unit,
      s"unit=$unit does not represent damping 0.85 exactly (power of ten >= $MinUnit)")
    // static denominators: the per-edge (src, dst, outdeg) table is fixed
    // across iterations — join it once, cache CLUSTERED AND SORTED on src
    // so every iteration's sort-merge join reuses the cached partitioning
    // and ordering (InMemoryTableScan preserves both): the edge-sized side
    // never re-exchanges or re-sorts, only the node-sized rank table moves
    val pre = e.join(deg, "src")
      .repartition(col("src")).sortWithinPartitions("src").cache()
    try {
      pre.count()
      e.unpersist()
      var ranks = deg.select(col("src").as("id"), lit(unit).as("r")).localCheckpoint()
      for (i <- 1 to iters) {
        // merge hint: ranks is node-sized — at web-graph scale it can never
        // broadcast, so SMJ over the pre-clustered cache IS the production
        // plan; pinning it also stops AQE from materializing a throwaway
        // exchange of the edge-sized side before flipping strategies
        val contribs = pre.hint("merge").join(ranks, pre("src") === ranks("id"))
          .groupBy(col("dst")).agg(sum(expr("r div outdeg")).as("contrib"))
        // left join back to the node universe: a node receiving no mass
        // this round still keeps its base rank (and its out-contributions
        // next round) instead of silently dropping out of the table
        ranks = deg.select(col("src").as("id"))
          .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit(base) +
              expr(s"($damping * coalesce(contrib, cast(0 as bigint))) div $unit"))
              .as("r"))
        // materialize on a 4-round stride (and always the last): ranks is
        // consumed exactly once per round, so the chain is linear and a
        // 4-round lineage (four join+agg layers over the cached pre) is
        // still constant-bounded — each skipped eager localCheckpoint is
        // a full job round-trip saved (guide §1.2; was a 2-round stride —
        // the i==iters checkpoint is load-bearing: pre.unpersist() runs
        // before the caller's action, so the result must not depend on
        // the cache)
        if (i % 4 == 0 || i == iters) ranks = ranks.localCheckpoint()
      }
      ranks.withColumn("unit", lit(unit))
    } finally { pre.unpersist(); e.unpersist() } // both idempotent; e is
    // normally already released right after pre materializes
  }
}
