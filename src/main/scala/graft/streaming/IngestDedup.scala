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
  *   - labels      `labelsPath/v=<v>/`     a label DELTA per version —
  *                                         the touched components + the
  *                                         batch's singletons, committed
  *                                         LAST — the version's
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
  * The label store is DELTA-VERSIONED (the MVCC-lite every table format
  * uses for exactly this reason): round 8 wrote a FULL labeling per
  * version, which makes every micro-batch pay a corpus-sized write — at
  * 100 TB that is billions of label rows re-written to fold in a
  * thousand-document batch. A version now carries only
  * [[Dedup.incrementalGroupsDelta]]'s touched components plus the
  * batch's singletons; [[labels]] folds base ⊕ deltas with
  * latest-version-wins per id (one groupBy over version-stamped rows —
  * versions are zero-padded, so lexicographic max IS recency). Every
  * [[CompactEvery]]-th batch writes a full snapshot instead (marked
  * [[FullMarker]]), so the read-side fold is bounded at CompactEvery
  * versions; a missing marker only deepens the fold, never corrupts it
  * (the per-id max is idempotent over any suffix of versions that
  * includes a full one).
  *
  * Scale: the per-batch work is |batch| shingling + the (band, bh)
  * equi-join against the index + a candidate-sized verify + a
  * touched-component-sized relabel AND a touched-component-sized label
  * write ([[Dedup.incrementalGroupsDelta]]); the corpus-sized label
  * table is read-folded but never re-written outside compaction points.
  * The full-corpus signature pass happens exactly once, at bootstrap.
  */
object IngestDedup {

  /** LSH + verify parameters of one ingest loop, fixed at bootstrap (the
    * index sidecar rejects a mismatched probe loudly). */
  final case class Params(n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                          verifyThreshold: Double = 0.5)

  private val BaseVersion = "b000000000"

  /** Version-dir marker naming a FULL label snapshot (vs a delta); the
    * base version is full by construction and needs no marker. */
  val FullMarker = "_graft_full"

  /** Compaction stride: every Nth batch writes a full snapshot, bounding
    * the read-side delta fold at N versions. */
  val CompactEvery = 8

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

  /** All committed label versions under `labelsPath`, ascending
    * (bootstrap writes [[BaseVersion]], so a running loop always has
    * one). */
  private def committedVersions(s: SparkSession, labelsPath: String): Seq[String] = {
    val (fs, root) = fsOf(s, labelsPath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(v => committed(s, s"$labelsPath/v=$v"))
      .sorted
  }

  /** The loop's current labeling: (id, group_id) folded from the latest
    * full snapshot plus every later committed DELTA, latest version
    * winning per id — what a downstream keep-one-per-group read
    * consumes. Zero-padded version strings make the struct max the
    * recency order; the single-version fast path (fresh bootstrap, or a
    * read landing right on a compaction point) is a plain read.
    */
  def labels(s: SparkSession, labelsPath: String): DataFrame = {
    val vs = committedVersions(s, labelsPath)
    if (vs.isEmpty)
      throw new IllegalStateException(
        s"no committed label version under $labelsPath — run ensureIngestState first")
    val (fs, root) = fsOf(s, labelsPath)
    def isFull(v: String): Boolean = v == BaseVersion ||
      fs.exists(new Path(root, s"v=$v/$FullMarker"))
    val from = vs.filter(isFull).lastOption.getOrElse(
      throw new IllegalStateException(
        s"label store at $labelsPath has committed delta versions " +
          s"(${vs.mkString(", ")}) but NO full snapshot — the base " +
          s"version $BaseVersion (or a $FullMarker'd compaction) is " +
          "missing or lost its _SUCCESS; the deltas alone cannot " +
          "reconstruct the labeling"))
    val fold = vs.dropWhile(_ != from)
    if (fold.size == 1) s.read.parquet(s"$labelsPath/v=${fold.head}")
    else fold.map(v =>
        s.read.parquet(s"$labelsPath/v=$v")
          .select(col("id"), col("group_id"), lit(v).as("_v")))
      .reduce(_ union _)
      .groupBy("id")
      .agg(max(struct(col("_v"), col("group_id"))).as("m"))
      .select(col("id"), col("m.group_id").as("group_id"))
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
    val prior = labels(s, labelsPath) // committed versions are < v here
    // the version's content is the DELTA: touched components + the
    // batch's singletons (batch ids are new — a committed replay was
    // already skipped above, so none of them carries a prior label)
    val delta = Dedup.incrementalGroupsDelta(prior, pairs.select("doc_a", "doc_b"))
    val withSingles = delta.union(
      docs.filter(col("batch") === v).select(col("doc_id").as("id"))
        .join(delta, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("group_id")))
    if ((batchId + 1) % CompactEvery == 0) {
      // compaction point: fold the delta into a FULL snapshot so reads
      // never stack more than CompactEvery versions
      val d = withSingles.localCheckpoint()
      val full = d.union(prior.join(d.select("id"), Seq("id"), "left_anti"))
      full.write.mode("overwrite").parquet(s"$labelsPath/v=$v")
      val (fs, _) = fsOf(s, labelsPath)
      fs.create(new Path(s"$labelsPath/v=$v/$FullMarker"), true).close()
    } else {
      withSingles.write.mode("overwrite").parquet(s"$labelsPath/v=$v")
    }
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
