package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.sim.SignBandIndex

/** Continuous SEMANTIC media ingest: feature-vector shards (BoVW image
  * embeddings, any fixed-dim `array<float>` column) arrive as a stream
  * and each micro-batch probes — and grows — the PERSISTED sign-band
  * index ([[SignBandIndex]]). The embedding-side companion of
  * [[IngestDedup]] (text LSH labels) and [[IngestIvf]]/[[IngestPq]]
  * (centroid/codebook stores): the fourth standing artifact a 100 TB
  * training-data pipeline maintains is its near-dup index, and new media
  * must be checked against it at arrival cost, not corpus cost.
  *
  * Transactional story: matches are PER-BATCH functions of (batch,
  * index-so-far), so each batch lands one `matchesPath/batch=<v>/`
  * (query_id, vec_id, sim) directory behind its own `_SUCCESS`, and the
  * index append inside [[SignBandIndex.ingestMatches]] carries its own
  * partition `_SUCCESS`. An at-least-once replay probes with its OWN
  * partition pruned from the index read, so it recomputes the identical
  * match set (exact per-vector buckets, deterministic planes) into the
  * same directory — convergent by construction, across either crash
  * window (after the index append, or after the matches write). Batches
  * are checkpoint-ordered, so batch N's probe sees exactly base ∪
  * batches 1..N-1 — the loop-closure semantics the oracle replays.
  */
object IngestSemBand {

  private def version(batchId: Long): String = f"b${batchId + 1}%09d"

  private def committed(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new Path(p, "_SUCCESS"))
  }

  /** Bootstrap: build (once) the banded index from the base corpus
    * features. Idempotent — delegates to the index's `_SUCCESS` guard.
    * `countForWidth` freezes the plane width from the corpus the loop
    * will ultimately serve (base ∪ expected arrivals) instead of the
    * base alone — see [[SignBandIndex.ensureIndex]].
    */
  def ensureState(baseFeat: DataFrame, indexPath: String,
                  p: SignBandIndex.Params,
                  countForWidth: Option[Long] = None): Unit =
    SignBandIndex.ensureIndex(
      baseFeat.select("vec_id", "embedding"), "vec_id", indexPath, p,
      countForWidth)

  /** One micro-batch: probe the stored index (growing it under this
    * batch's version), land the verified matches under the batch
    * partition exactly once — then run the MAINTENANCE contract: the
    * probe's own key counts are a free |batch|-cost creep signal
    * ([[SignBandIndex.ProbeStats]]); only when it fires does the loop pay
    * the full-index [[SignBandIndex.rebuildDue]] confirmation, and only a
    * confirmed creep triggers [[SignBandIndex.rebuild]] (atomic staging
    * swap — appends fold into a re-widened base, the hot set and the
    * sidecar profile reset). Ordering keeps replays convergent: the
    * rebuild runs strictly AFTER this batch's matches are durable, so a
    * replayed batch either skips on its own `_SUCCESS` (and the NEXT
    * batch's probe re-fires the creep signal — maintenance is deferred,
    * never lost while appends keep arriving) or re-probes the pre-rebuild
    * index it originally saw.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   matchesPath: String, p: SignBandIndex.Params,
                   threshold: Double): Unit = {
    val s = batch.sparkSession
    val v = version(batchId)
    val dir = s"$matchesPath/batch=$v"
    if (committed(s, dir)) return
    val (matches, stats) = SignBandIndex.ingestMatchesStats(
      batch.select("vec_id", "embedding"),
      "vec_id", indexPath, p, threshold, appendBatch = Some(v))
    matches.write.mode("overwrite").parquet(dir)
    if (stats.creep && SignBandIndex.rebuildDue(s, indexPath, p)) {
      System.err.println(s"[graft] sign-band ingest loop: rebuild due at " +
        s"batch $v (probe max occupancy ${stats.probeMaxOcc} > threshold " +
        s"${stats.rebuildThreshold}) — re-widening $indexPath")
      SignBandIndex.rebuild(s, indexPath, p)
    }
  }

  /** Every match the loop has committed so far: (query_id, vec_id, sim,
    * batch) — query_id is always the arriving side of its batch.
    */
  def matches(s: SparkSession, matchesPath: String): DataFrame =
    s.read.parquet(matchesPath)

  /** Attach the loop to a streaming (vec_id, embedding) frame; the
    * caller picks trigger/checkpoint and starts it.
    */
  def attach(stream: DataFrame, indexPath: String, matchesPath: String,
             p: SignBandIndex.Params,
             threshold: Double): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexPath, matchesPath, p, threshold)
    }

  /** Drain the feed and stop (Trigger.AvailableNow) — catch-up mode. */
  def runAvailable(stream: DataFrame, indexPath: String, matchesPath: String,
                   checkpoint: String, p: SignBandIndex.Params,
                   threshold: Double): StreamingQuery =
    attach(stream, indexPath, matchesPath, p, threshold)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
