package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.text.Dedup

/** The ingest-dedup loop as a STREAMING sink: a document feed is landed,
  * near-dup'd against everything already ingested, and folded into the
  * corpus's dedup-group labels — continuously, with per-micro-batch cost
  * proportional to the batch and its candidates, never the corpus.
  *
  * The reference pipeline is batch-only (its REST ingest is a manual
  * re-run, src/ETL-NPL-Pipeline.py:271-327); a training-data corpus ingests
  * forever, so the batch artifacts ([[Dedup.ensureBandIndex]]'s growing
  * signature index, [[Dedup.ensureGroupLabels]]' labels) are driven here by
  * Structured Streaming `foreachBatch` — the standard shape for streaming
  * maintenance of transactional batch artifacts: the driver only
  * coordinates; every data pass is a distributed job.
  *
  * Three co-versioned stores, all commit-marker idempotent so an
  * at-least-once replay (crash anywhere, restart, even a deleted
  * checkpoint) CONVERGES instead of duplicating:
  *
  *   - doc store   `docsPath/batch=<v>/`   arrivals land once per batch
  *                                         (partition `_SUCCESS` guard);
  *   - band index  `indexPath/batch=<v>/`  signatures appended after the
  *                                         probe ([[Dedup.ingestPairs]]);
  *   - labels      `labelsPath/v=<v>/`     a full labeling per version,
  *                                         committed LAST — the version's
  *                                         `_SUCCESS` is the batch's
  *                                         overall commit record.
  *
  * A batch whose label version is committed is skipped wholesale; a batch
  * that crashed mid-way re-runs against stores whose per-partition guards
  * (and the probe's own-partition prune) make the re-run read-your-own-
  * replay-safe. Versions are `b`-prefixed zero-padded batch ids, so the
  * "latest committed" scan is a lexicographic max over directory names —
  * no driver-side bookkeeping beyond the file listing.
  *
  * Scale: the per-batch work is |batch| shingling + the (band, bh)
  * equi-join against the index + a candidate-sized verify + a
  * touched-component-sized relabel ([[Dedup.incrementalGroups]]). The
  * corpus-sized label table is touched by one semi-join and one anti-join;
  * the full-corpus signature pass happens exactly once, at bootstrap.
  */
object IngestDedup {

  /** LSH + verify parameters of one ingest loop, fixed at bootstrap (the
    * index sidecar rejects a mismatched probe loudly). */
  final case class Params(n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                          verifyThreshold: Double = 0.5)

  private val BaseVersion = "b000000000"

  private def version(batchId: Long): String = f"b${batchId + 1}%09d"

  private def fsOf(s: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def committed(s: SparkSession, dir: String): Boolean = {
    val (fs, p) = fsOf(s, dir)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  /** Land `df` at `dir` exactly once (skip if the dir already carries its
    * `_SUCCESS`) — the same per-partition idempotence as the index append.
    */
  private def landOnce(df: DataFrame, dir: String): Unit =
    if (!committed(df.sparkSession, dir))
      df.write.mode("overwrite").parquet(dir)

  /** Highest committed label version under `labelsPath` (bootstrap writes
    * [[BaseVersion]], so a running loop always has one). */
  private def latestVersion(s: SparkSession, labelsPath: String): Option[String] = {
    val (fs, root) = fsOf(s, labelsPath)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(v => committed(s, s"$labelsPath/v=$v"))
      .sorted.lastOption
  }

  /** The loop's current labeling: (id, group_id) at the latest committed
    * version — what a downstream keep-one-per-group read consumes.
    */
  def labels(s: SparkSession, labelsPath: String): DataFrame = {
    val v = latestVersion(s, labelsPath).getOrElse(
      throw new IllegalStateException(
        s"no committed label version under $labelsPath — run ensureIngestState first"))
    s.read.parquet(s"$labelsPath/v=$v")
  }

  /** Bootstrap the three stores from the base corpus (idempotent; cheap
    * no-op when all three are committed): land `baseDocs` as the doc
    * store's base partition, build the band index from the LANDED copy
    * (the store, not the caller's frame, is the loop's source of truth),
    * and write the base labels as version [[BaseVersion]].
    */
  def ensureIngestState(baseDocs: DataFrame, docsPath: String,
                        indexPath: String, labelsPath: String,
                        p: Params): Unit = {
    val s = baseDocs.sparkSession
    landOnce(baseDocs.select("doc_id", "text"), s"$docsPath/batch=$BaseVersion")
    val landed = s.read.parquet(s"$docsPath/batch=$BaseVersion")
    Dedup.ensureBandIndex(landed, indexPath, p.n, p.numHashes, p.bands)
    Dedup.ensureGroupLabels(landed, s"$labelsPath/v=$BaseVersion",
      p.n, p.numHashes, p.bands, p.verifyThreshold)
  }

  /** One micro-batch of the loop (also the batch-mode entry point for a
    * non-streaming caller with its own batch numbering). Steps:
    * land → probe + grow index → fold labels → commit version.
    */
  def processBatch(batch: DataFrame, batchId: Long, docsPath: String,
                   indexPath: String, labelsPath: String, p: Params): Unit = {
    val s = batch.sparkSession
    val v = version(batchId)
    // the version's label dir is the batch's commit record: committed ⇒
    // every store already holds this batch ⇒ nothing to do
    if (committed(s, s"$labelsPath/v=$v")) return
    landOnce(batch.select("doc_id", "text"), s"$docsPath/batch=$v")
    // the store's landed copy (not the in-memory micro-batch) feeds the
    // probe: deterministic under replay, and the corpus side of the
    // candidate verify partition-prunes to candidate batches only.
    // `batch <= v` pins the doc universe to this batch's view even if
    // later partitions exist from a pre-crash run that got further.
    val docs = s.read.parquet(docsPath).filter(col("batch") <= v)
      .select("doc_id", "text", "batch")
    val pairs = Dedup.ingestPairs(docs, col("batch") === v, indexPath,
      p.n, p.numHashes, p.bands, p.verifyThreshold, appendBatch = Some(v))
    val prior = labels(s, labelsPath) // latest committed is < v here
    val merged = Dedup.incrementalGroups(prior, pairs.select("doc_a", "doc_b"))
    // batch docs with no pair anywhere enter the labeling as singletons
    val withSingles = merged.union(
      docs.filter(col("batch") === v).select(col("doc_id").as("id"))
        .join(merged, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("group_id")))
    withSingles.write.mode("overwrite").parquet(s"$labelsPath/v=$v")
  }

  /** Attach the loop to a streaming (doc_id, text) frame. The caller picks
    * trigger/checkpoint and calls `.start()`; every micro-batch runs
    * [[processBatch]] with the stream's transactional batch id.
    */
  def attach(stream: DataFrame, docsPath: String, indexPath: String,
             labelsPath: String, p: Params): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, docsPath, indexPath, labelsPath, p)
    }

  /** Drain everything currently in the feed and stop (Trigger.AvailableNow):
    * the catch-up / backfill mode of the loop. Returns the started query;
    * callers await termination.
    */
  def runAvailable(stream: DataFrame, docsPath: String, indexPath: String,
                   labelsPath: String, checkpoint: String, p: Params): StreamingQuery =
    attach(stream, docsPath, indexPath, labelsPath, p)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
