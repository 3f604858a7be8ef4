package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSuite}

/** Physical-plan shape assertions for the round-3 queries' scale claims
  * (PLANS.md is the prose; this pins the load-bearing facts so a
  * regression in Catalyst usage fails a test, not a 100 TB run).
  * Shuffle counts are over the pre-execution plan (AQE may coalesce at
  * runtime but never adds exchanges).
  */
class PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange (hash|range|Single)".r.findAllIn(p).length

  test("q_zorder_key is map-only: the presentation sort is the only exchange") {
    val p = plan("q_zorder_key")
    assert(shuffles(p) == 1, p)
    assert(p.contains("zorder_key"), "the codegen'd key must be in the plan")
  }

  test("q_chunk_overlap generates chunks in-row: one exchange (the sort)") {
    assert(shuffles(plan("q_chunk_overlap")) == 1, plan("q_chunk_overlap"))
  }

  test("q_pii_redact is a pure scan pipeline: one exchange (the sort)") {
    assert(shuffles(plan("q_pii_redact")) == 1, plan("q_pii_redact"))
  }

  test("q_bloom_join prunes in the scan stage before any exchange") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"), "bloom predicate missing from the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the bloom filter must sit UNDER the join (scan-side), not above it:
    // in the formatted tree the Filter(might_contain...) appears after the
    // join operator's own line, directly over the lineitem scan
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      "bloom filter should be on the scan side beneath the join")
  }

  test("q_grouping_sets computes all margins in ONE Expand pass") {
    val p = plan("q_grouping_sets")
    assert("Expand".r.findAllIn(p).length == 1, p)
  }

  test("q_embed_gram aggregates through the native one-buffer GramAgg") {
    val p = plan("q_embed_gram")
    assert(p.contains("gramagg") || p.contains("gram_agg") || p.contains("GramAgg"), p)
    // single-group aggregate + explode + presentation sort: at most the
    // single-partition agg exchange and the sort exchange
    assert(shuffles(p) <= 2, p)
  }

  test("q_fuzzy_match candidates come from an equi-join, never a cartesian") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_sql_region_revenue broadcasts the dimension chain") {
    val p = plan("q_sql_region_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // supplier, nation, region (and customer at this sf) broadcast: the
    // only hash-shuffles left are fact-side equi-joins + the aggregate
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
  }

  test("q_copurchase never self-joins the corpus: no join operator at all") {
    val p = plan("q_copurchase")
    assert(!p.contains("Join"), p) // pairs explode in-row from baskets
  }

  test("q_cdc_chunks is flag + prefix-sum window + rebuild: no joins") {
    val p = plan("q_cdc_chunks")
    assert(!p.contains("Join"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q_equidepth buckets via broadcast bounds: no shuffle join of the scan") {
    val p = plan("q_equidepth")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q_transitions sequences per user: exactly one window partition key") {
    val p = plan("q_transitions")
    assert(!p.contains("Join"), p)
    assert(p.contains("lead("), p)
  }

  test("q_drift_psi attaches pivot and totals broadcast-only: no shuffle join") {
    val p = plan("q_drift_psi")
    // the 1-row pivot and totals ride BroadcastNestedLoopJoin by design;
    // a SortMergeJoin/ShuffledHashJoin would mean the corpus-scale scan
    // got shuffled to meet driver-sized metadata
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("q_bm25 is map + 1-row stats broadcast + bounded-heap top-k") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), p)
    // the single-partition stats aggregate is the ONLY exchange: tf comes
    // off the token array in-row, and the top-k needs no global sort
    assert(shuffles(p) <= 1, p)
  }

  test("q_weighted_median cumsum is partition-parallel, not one task per group") {
    // (the range exchange itself is behind groupedPrefixSum's eager
    // checkpoint, so it can't show in this plan; what CAN regress here is
    // the window shape) — the cumulative sum must partition by
    // (_pid, group): a window partitioned by the 3-value group column
    // alone while ordering by the value is 3 single-thread sort tasks
    // over a table that grows with the data, forever
    val p = plan("q_weighted_median").toLowerCase
    assert("windowspecdefinition\\(_pid#\\d+, l_returnflag".r.findAllIn(p).nonEmpty, p)
    assert("windowspecdefinition\\(l_returnflag#\\d+, v#\\d+ asc".r.findAllIn(p).isEmpty,
      "group-only cumsum window found: " + p)
  }

  test("q_filter_cascade attributes stages in-row: no join, one agg shuffle") {
    val p = plan("q_filter_cascade")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) == 2, p) // the combinable count + presentation sort
  }

  test("IVF batch assignment joins broadcast centroids, no cartesian") {
    // q_kmeans_lloyd's own plan is a checkpoint scan (each Lloyd round is
    // eagerly materialized), so the assignment SHAPE is pinned on the
    // incremental path, whose plan is the live assignPts pipeline:
    // centroids (k·dim rows) broadcast into the point join, distance
    // aggregate partial+final, and no cartesian/nested-loop anywhere
    val p = plan("q_ivf_incremental")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "distance/argmin aggregation must be map-side combinable:\n" + p)
  }

  test("q_ivf_refined probes without a corpus self-product") {
    val p = plan("q_ivf_refined")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop allowed is attaching the broadcast 1-row query
    // embedding to the surviving candidates for the re-rank
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("PQ-ADC search joins the codebook and LUT as broadcasts only") {
    // q_ann_pq's live plan: codes ⋈ broadcast(LUT) summed map-side, the
    // shortlist a bounded TakeOrdered, the re-rank a semi-ish hash join —
    // never a corpus self-product, never a shuffled codebook
    val p = plan("q_ann_pq")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"),
      "ADC distance sum must be map-side combinable:\n" + p)
    // one nested-loop max: the broadcast 1-row query embedding for re-rank
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("IVF-PQ's only shuffle-joins are corpus-keyed; dims all broadcast") {
    val p = plan("q_ann_ivfpq")
    assert(!p.contains("CartesianProduct"), p)
    // residual build + code/assignment joins may sort-merge on vec_id
    // (corpus-sized both sides — correct at scale); every centroid /
    // codebook / LUT / probe join must be a broadcast
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("q_adamic_adar wedges come from equi-joins, never a cartesian") {
    val p = plan("q_adamic_adar")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_freq_triples explodes baskets in-row: no join operator at all") {
    val p = plan("q_freq_triples")
    assert(!p.contains("Join"), p)
  }

  test("q_perplexity joins tokens to the vocab by key, no cartesian; counts combine map-side") {
    val p = plan("q_perplexity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-doc aggregation must be map-side combinable:\n" + p)
    // the 1-row corpus-total broadcast is the only nested loop
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("q_sorted_blocking never joins: per-block windows + in-row verify only") {
    val p = plan("q_sorted_blocking")
    assert(!p.contains("Join"), p)
  }

  test("q_knn_classify candidates come from the band equi-join, never n²") {
    val p = plan("q_knn_classify")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_mmr runs k-bounded: broadcast loops only, no cartesian, no shuffle join") {
    val p = plan("q_mmr")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "every MMR-round join is shortlist-sized and must broadcast:\n" + p)
  }

  test("q_rolling_active expands windows in-row: no range join, span broadcast only") {
    val p = plan("q_rolling_active")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode") || p.contains("explode"),
      "the ×7 window membership must be an in-row explode:\n" + p)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  // ───── round-6 session-2 final batch (verdict r6 ask #7): pin the plan
  // shapes of the 7 newest queries the prose audit never covered ─────

  test("q_value_quantiles_by_type is one grouped aggregate: agg + sort exchanges only") {
    val p = plan("q_value_quantiles_by_type")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) <= 2, p) // type-hash agg + presentation sort
  }

  test("q_dormancy_topk reuses the window's user partitioning for the per-user max") {
    val p = plan("q_dormancy_topk")
    assert(!p.contains("Join"), p)
    // top-20 must be a bounded TakeOrdered, not a global range-sort
    assert(p.contains("TakeOrderedAndProject"), p)
    // the lag window hash-partitions by user_id; the groupBy(user_id) agg
    // must ride that same exchange, not add its own
    assert(shuffles(p) <= 1, "expected ONE user_id exchange shared by window+agg:\n" + p)
  }

  test("q_holdout_split joins its split totals broadcast, never shuffled") {
    val p = plan("q_holdout_split")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "the 3-row split-total side must broadcast:\n" + p)
  }

  test("q_dup_cluster_sizes inherits the banded-pairs shape: no cartesian anywhere") {
    val p = plan("q_dup_cluster_sizes")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_length_quality_corr is one global moment pass: single-partition agg only") {
    val p = plan("q_length_quality_corr")
    assert(!p.contains("Join"), p)
    assert(shuffles(p) == 1, "partial moments combine into ONE single-partition exchange:\n" + p)
  }

  test("q_mrr broadcasts the 10 query vectors; truth joins ann on an equi-key") {
    val p = plan("q_mrr")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested loops are the fixed-10-row query-vector broadcasts
    // (exact-truth side and banded side each take one)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2, p)
  }

  test("q_source_concentration folds HHI with only the 1-row total broadcast") {
    val p = plan("q_source_concentration")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  // ───── round-7 additions ─────

  test("q_dsir_weights: one token explode, bucket-spine joins broadcast-only") {
    val p = plan("q_dsir_weights")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested loop is the 1-row distribution-totals broadcast;
    // the 64-row log-ratio table must reach the per-doc table as a
    // broadcast hash join, never a shuffle of the corpus-sized side
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "distribution counts must combine map-side:\n" + p)
  }

  test("q_rrf_fusion: bounded-heap top-50s, no full corpus sort, no cartesian") {
    val p = plan("q_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "each ranker's top-50 must be a bounded heap:\n" + p)
  }

  test("q_ndcg reads the stamped tables and joins on equi-keys only") {
    val p = plan("q_ndcg")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
