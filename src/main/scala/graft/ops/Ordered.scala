package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered/stateful fills — the reference's imperative carry-forward loops
  * (pandas `ffill` src/ETL-NPL-Pipeline.py:131; the year fill-down loop
  * :388-404) as window expressions (SURVEY.md §2.7).
  *
  * Scale note: prefer the partitioned form — an un-partitioned window is a
  * single-task sort, acceptable only for ingest-sized data. The reference
  * only ever fills over <200-row frames.
  */
object Ordered {

  /** Forward-fill `c` within `partition`, ordered by `order` — the value of
    * the last non-null preceding row (pandas `ffill`).
    */
  def ffill(c: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val w0 = if (partition.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(partition: _*).orderBy(order: _*)
    last(c, ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** The GDP-sheet fill-down (src/ETL-NPL-Pipeline.py:388-404): rows whose
    * `label` is a 4-char year set the running year; other rows inherit it.
    * Returns the carried-forward year column.
    */
  def carryYear(label: Column, order: Seq[Column]): Column =
    ffill(when(length(label) === 4, label), Seq.empty, order)

  /** Dense contiguous global row ids 1..n in `order`-order, WITHOUT the
    * single-task keyless window a naive `row_number() OVER (ORDER BY …)`
    * plans — the standard distributed id-assignment shape for a 100 TB
    * corpus (global ids for training-example manifests, shard offsets):
    *
    *  1. range-repartition on the order key → partition i holds keys
    *     strictly below partition i+1's (RangePartitioner's contract), all
    *     partitions rank in parallel;
    *  2. per-partition counts → prefix-sum offsets. This window IS keyless
    *     but runs over one row PER PARTITION — bounded by cluster size,
    *     not data size;
    *  3. id = partition offset + intra-partition rank (a partitioned
    *     window), offsets broadcast back.
    *
    * The intra-partition rank is NOT a window: the checkpointed layout has
    * UnknownPartitioning, so `row_number() OVER (PARTITION BY _pid)` would
    * re-exchange and re-sort the whole table just to rank rows that are
    * already range-placed and locally sorted. Instead the local sort is
    * done once (sortWithinPartitions — no exchange) and the rank is read
    * off `monotonically_increasing_id`, whose lower bits are the
    * per-partition row counter: rank = _mid − min(_mid in partition).
    * That counter being CONSECUTIVE is implementation behavior rather
    * than the function's documented contract (which only promises
    * monotonicity), so the offsets aggregate carries an `assert_true`
    * guard — max−min+1 must equal the partition count — that fails the
    * job loudly if a Spark version ever gaps it, instead of silently
    * emitting non-dense ids. The big side then pays ONE range exchange +
    * local sort, a broadcast join, and a projection — no second shuffle,
    * no second sort.
    *
    * The range exchange is materialized once (localCheckpoint) because
    * BOTH the offset aggregation and the final projection consume it:
    * RangePartitioner samples boundaries per execution, so recomputing the
    * exchange in two jobs could place rows differently between the counts
    * and the ranks — offsets from one layout applied to another. Pinning
    * one layout makes the result exactly `row_number() OVER (ORDER BY
    * order)` regardless of sampling, provided `order` is a total order
    * (unique key) — with ties the ids are still dense 1..n but tie order
    * is partitioner-dependent.
    */
  /** Exclusive weighted prefix sum in global `order`-order: every row gets
    * `sum(weight)` over all strictly-preceding rows — the quantity sequence
    * packing, shard-offset assignment, and byte-range manifest building
    * all need. Same distributed scaffold as [[globalRowIds]] (range
    * repartition → per-partition totals → broadcast prefix offsets), but a
    * RUNNING weighted sum cannot be read off the monotonic-id counter, so
    * the intra-partition cumsum is a `PARTITION BY _pid` window — one
    * hash exchange + local sort more than globalRowIds pays.
    *
    * That second exchange is why the input contract is a PRE-PROJECTED
    * NARROW table (key + weight — the caller computes the weight in a
    * map-only pass first): at 10^10 docs the (id, n_tokens) manifest is
    * ~160 GB, and two shuffles of it are noise next to one scan of the
    * 100 TB text it describes. The returned manifest joins back to the
    * corpus on the key only if the caller needs it inline — usually it IS
    * the deliverable.
    *
    * Ties in `order` get partitioner-dependent relative placement (same
    * caveat as globalRowIds); pass a unique key.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], weight: Column,
                cumName: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // one layout pinned for both consumers (see globalRowIds scaladoc)
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("_w", weight.cast("long"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged.groupBy("_pid").agg(sum("_w").as("_pw"))
      .withColumn("_off",
        coalesce(sum("_pw").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    val intra = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(cumName, col("_off") + coalesce(sum(col("_w")).over(intra), lit(0L)))
      .drop("_w", "_pid", "_off")
  }

  /** GROUPED inclusive weighted prefix sum: for every row, `sum(weight)`
    * over the rows of the SAME group at-or-before it in `order` — the
    * cumulative-distribution step of weighted medians/quantiles. A plain
    * `Window.partitionBy(group).orderBy(order)` computes this with one
    * single-thread task PER GROUP, so a 3-group table sorts on 3 cores
    * no matter how many values it holds; here the table is instead
    * range-partitioned on (group, order) — parallelism = partition
    * count — and each group's per-partition subtotals (a parts×groups
    * table, broadcast-sized by construction) become running offsets
    * added to the partition-local cumsum, exactly the [[prefixSum]]
    * scaffold with group-aware offsets.
    *
    * The weight keeps its input type (no long cast): decimal weights
    * accumulate exactly, so the result is partition-layout-independent
    * wherever (group, order) is a total order — with order ties the
    * inclusive sum is layout-dependent (same caveat as [[prefixSum]]);
    * pass a unique (group, order) key.
    */
  def groupedPrefixSum(df: DataFrame, group: Seq[String], order: Seq[Column],
                       weight: Column, cumName: String,
                       numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val gcols = group.map(col)
    // one layout pinned for both consumers (see globalRowIds scaladoc)
    val ranged = df.repartitionByRange(parts, (gcols ++ order): _*)
      .withColumn("_w", weight)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged.groupBy("_pid", group: _*).agg(sum("_w").as("_pw"))
      .withColumn("_off",
        coalesce(sum("_pw").over(Window.partitionBy(gcols: _*).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select("_pid", group :+ "_off": _*)
    val intra = Window.partitionBy(("_pid" +: group).map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.join(broadcast(offsets), "_pid" +: group)
      .withColumn(cumName, col("_off") + sum(col("_w")).over(intra))
      .drop("_w", "_pid", "_off")
  }

  def globalRowIds(df: DataFrame, order: Seq[Column], idName: String,
                   numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint()
    val offsets = ranged.groupBy("_pid")
      .agg(count(lit(1)).as("_n"), min("_mid").as("_mn"), max("_mid").as("_mx"))
      .withColumn("_off",
        coalesce(sum("_n").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          // consecutive-counter guard (see scaladoc): throws on violation,
          // adds 0 otherwise — assert_true yields NULL on success
          + coalesce(assert_true((col("_mx") - col("_mn") + 1) === col("_n"))
              .cast("long"), lit(0L)))
      .select("_pid", "_mn", "_off")
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(idName, col("_off") + (col("_mid") - col("_mn")) + 1)
      .drop("_pid", "_mid", "_mn", "_off")
  }
}
