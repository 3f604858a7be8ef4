package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The INGEST-LOOP form of multi-index Hamming search: a persisted
  * half-key index over perceptual-hash signatures (image average-hash,
  * audio energy-delta fingerprints, per-frame video phash) that arriving
  * media batches probe — and grow — at |batch| cost, never re-scanning
  * or re-hashing the standing corpus.
  *
  * [[Hamming.nearPairs]] is the batch-mode primitive (complete at
  * Hamming ≤ 3 by pigeonhole; see Hamming.scala for the scheme and its
  * measured linearity). Its ingest gap: a new media batch had to rebuild
  * the whole (half, key) table per arrival. This store mirrors the text
  * band-index loop ([[graft.text.Dedup.ensureBandIndex]] /
  * `ingestPairs`) exactly:
  *
  *   - the index is (id, h1, h2) parquet laid out as `path/batch=base/…`
  *     plus one `batch=<id>/` partition per ingested batch — ~24 bytes
  *     per document, independent of media size, the artifact that makes
  *     perceptual dedup affordable per-arrival at 100 TB;
  *   - a [[SpecFile]] sidecar (written LAST, after the data commit)
  *     pins maxHamming and maxKeyDf; every probe/append `require`s a
  *     match — a capped index probed uncapped (or vice versa) would
  *     silently return a DIFFERENT pair set, so a mismatch is
  *     corrupt-by-construction, not a recall knob;
  *   - appends are idempotent on the batch partition's own `_SUCCESS`,
  *     so an at-least-once replay overwrites its partial partition
  *     instead of duplicating rows, and the probe prunes a replayed
  *     batch's partition out of its index read (partition-pruned scan).
  *
  * Hot-key state (`maxKeyDf = Some(cap)` — the stop-shingle rule in
  * Hamming space, forced by atom-heavy signatures like per-frame video
  * hashes): the capped semantics need each endpoint's half-key bucket
  * size over the WHOLE corpus-so-far, which naively costs a corpus
  * groupBy per batch. Instead the store maintains the MONOTONE HOT SET
  * under `path/_hot/batch=…`: the index is append-only, so a key's
  * count only changes when an arriving batch CONTAINS it — newly-hot
  * keys are exactly the batch's own keys whose (corpus-so-far + batch)
  * count crosses the cap, computable from one broadcast-semi-joined
  * index scan with a |batch|-key shuffle. Inductively the accumulated
  * hot set after batch N equals {key : count over base ∪ batches 1..N
  * > cap} — the exact capped semantics of a full recompute — because a
  * key crossing the cap at some prefix must appear in that prefix's
  * last contributing batch. Cool flags are then two broadcast lookups
  * against the (tiny) hot set on each side; the corpus side pays only
  * the scan it already pays for the probe join.
  *
  * Scale: per batch, the probe side emits 66 keys per row (|batch|·66,
  * broadcast under AQE against the index scan), the index side is
  * scanned once (never shuffled — the build's identity keys ARE the
  * stored layout), candidates are identical-half-class-sized, and the
  * append is one |batch|-row parquet write. Per-batch cost is
  * |batch| + |candidates|, measured by the store:mih_probe scale row
  * (fixed batch, corpus ×10).
  */
object MihIndex {

  /** Sidecar filename pinning the parameters the index was built with. */
  val SpecFile = "_graft_mih_spec"

  /** Probe/index parameters, fixed at bootstrap. */
  final case class Params(maxHamming: Int = 3, maxKeyDf: Option[Int] = None)

  private def specJson(p: Params): String =
    s"""{"maxHamming":${p.maxHamming},"maxKeyDf":${p.maxKeyDf.getOrElse(-1)}}"""

  private def fsOf(s: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def requireSpec(fs: org.apache.hadoop.fs.FileSystem, root: Path,
                          p: Params): Unit = {
    val specPath = new Path(root, SpecFile)
    require(fs.exists(specPath),
      s"MIH index at $root has no $SpecFile sidecar — not a graft MIH index " +
        "(or written by a pre-sidecar version; rebuild with ensureIndex)")
    val in = fs.open(specPath)
    val stored =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val want = specJson(p)
    require(stored == want,
      s"MIH index at $root was built with $stored but probed with $want — " +
        "pass the build-time parameters or rebuild the index")
  }

  /** Materialize the MIH half-key index of a hash table at `path`
    * (idempotent: a complete index is left untouched). Input: `hashes`
    * with (idCol, h1, h2), halves packed 32-bit non-negative longs
    * (validated per row). When capped, the base hot set — keys whose
    * bucket exceeds the cap over the base corpus — is persisted under
    * `_hot/batch=base` so no later probe re-derives corpus counts.
    */
  def ensureIndex(hashes: DataFrame, idCol: String, path: String,
                  p: Params): Unit = {
    Hamming.requireMaxHamming(p.maxHamming)
    p.maxKeyDf.foreach(c => require(c > 0, s"maxKeyDf=$c must be positive"))
    val s = hashes.sparkSession
    val (fs, root) = fsOf(s, path)
    val done = new Path(root, "_SUCCESS")
    val spec = new Path(root, SpecFile)
    if (fs.exists(done) && fs.exists(spec)) {
      requireSpec(fs, root, p)
    } else {
      // no _SUCCESS (crashed build) or no sidecar: rebuild from scratch
      val checked = Hamming.checkedHalves(hashes, idCol)
      checked.withColumn("batch", lit("base"))
        .write.mode("overwrite").partitionBy("batch").parquet(path)
      if (p.maxKeyDf.isDefined)
        baseHot(s.read.parquet(path), p.maxKeyDf.get)
          .write.mode("overwrite").parquet(s"$path/_hot/batch=base")
      val out = fs.create(spec, true)
      try out.write(specJson(p).getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Hot keys of a standing hash table: (half, k) whose bucket size
    * exceeds the cap — one groupBy per half, paid once at build.
    */
  private def baseHot(index: DataFrame, cap: Int): DataFrame =
    index.select(posexplode(array(col("h1"), col("h2"))).as(Seq("half", "k")))
      .groupBy("half", "k").agg(count(lit(1)).as("n"))
      .filter(col("n") > cap).select("half", "k")

  /** The accumulated hot set (base + every ingested batch's newly-hot
    * keys). Distinct-folded: a key can cross the cap only once (counts
    * are monotone under append-only batches), but a replayed batch may
    * have re-written its partition.
    */
  private def hotKeys(s: SparkSession, path: String,
                      excludeBatch: Option[String]): DataFrame = {
    val hot = s.read.parquet(s"$path/_hot")
    excludeBatch.foldLeft(hot)((h, b) => h.filter(col("batch") =!= b))
      .select("half", "k").distinct()
  }

  /** Incremental near-dup pairs of an arriving hash batch against a
    * corpus whose MIH index was persisted by [[ensureIndex]]: the batch
    * probes its Hamming-1 ball against the stored identity keys
    * (complete at Hamming ≤ maxHamming ≤ 3, exactly [[Hamming.nearPairs]]'
    * guarantee), and — `includeInternal` — the batch's own internal
    * near-dups come from one self-match over the same flagged frame.
    * Per-doc hashes are pure functions of the doc, so the result
    * provably equals the full-corpus [[Hamming.nearPairs]] over
    * corpus ∪ batch restricted to pairs with a batch side
    * (spec-asserted, capped and uncapped) — but the work scales with
    * |batch| + |candidates|, not |corpus|.
    *
    * `appendBatch = Some(id)` CLOSES the loop: after the candidates are
    * materialized, the batch's hashes are appended as a `batch=<id>/`
    * index partition and (when capped) its newly-hot keys as
    * `_hot/batch=<id>/` — both idempotent on their partition `_SUCCESS`,
    * so the NEXT batch's probe sees this one at no corpus cost.
    *
    * Returns canonical (id_a, id_b, hamming) with id_a < id_b.
    */
  def ingestNearPairs(batchHashes: DataFrame, idCol: String,
                      indexPath: String, p: Params,
                      appendBatch: Option[String] = None,
                      includeInternal: Boolean = true): DataFrame = {
    val s = batchHashes.sparkSession
    val (fs, root) = fsOf(s, indexPath)
    requireSpec(fs, root, p)
    val batch = Hamming.checkedHalves(batchHashes, idCol).localCheckpoint()
    // a replayed batch may ALREADY sit in the index — prune its own
    // partitions out of the probe (partition-pruned, so free) or the
    // re-run would see itself: self-pairs, and in-batch pairs leaking
    // through twice
    val index = appendBatch.foldLeft(s.read.parquet(indexPath)) {
      (ix, id) => ix.filter(col("batch") =!= id)
    }.select("id", "h1", "h2")
    // cool flags on both sides; when capped, fold the batch's own
    // contribution into the hot set FIRST (the symmetric recompute
    // counts the union, so must the probe)
    val (batchBase, indexBase, newlyHot) = p.maxKeyDf match {
      case None =>
        def flag(df: DataFrame) = df.select(col("id"), col("h1"), col("h2"),
          lit(true).as("c1"), lit(true).as("c2"))
        (flag(batch), flag(index), None)
      case Some(cap) =>
        // the batch's own key tallies (|batch|-sized)
        val bk = batch
          .select(posexplode(array(col("h1"), col("h2"))).as(Seq("half", "k")))
          .groupBy("half", "k").agg(count(lit(1)).as("nb"))
        // corpus-so-far counts FOR THE BATCH'S KEYS ONLY: the index scan
        // is broadcast-semi-joined down to |batch| keys before the
        // (map-side combinable) count — no corpus-key shuffle
        val ck = index
          .select(posexplode(array(col("h1"), col("h2"))).as(Seq("half", "k")))
          .join(broadcast(bk.select("half", "k")), Seq("half", "k"), "left_semi")
          .groupBy("half", "k").agg(count(lit(1)).as("nc"))
        // a key's count changes ONLY when the batch contains it — so the
        // newly-hot keys are exactly the batch keys crossing the cap now
        val fresh = bk.join(ck, Seq("half", "k"), "left")
          .filter(col("nb") + coalesce(col("nc"), lit(0L)) > cap)
          .select("half", "k")
        val hot = hotKeys(s, indexPath, appendBatch).union(fresh)
          .distinct().localCheckpoint()
        def flag(df: DataFrame) = df
          .join(broadcast(hot.filter(col("half") === 0).select(col("k").as("_hk1"))),
            col("h1") === col("_hk1"), "left")
          .join(broadcast(hot.filter(col("half") === 1).select(col("k").as("_hk2"))),
            col("h2") === col("_hk2"), "left")
          .select(col("id"), col("h1"), col("h2"),
            col("_hk1").isNull.as("c1"), col("_hk2").isNull.as("c2"))
        (flag(batch), flag(index), Some(fresh))
    }
    val mixed = Hamming.matched(
        Hamming.probeSide(batchBase), Hamming.indexSide(indexBase), p.maxHamming)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("hamming"))
    val all =
      if (!includeInternal) mixed
      else mixed.union(
        Hamming.matched(Hamming.probeSide(batchBase),
            Hamming.indexSide(batchBase), p.maxHamming)
          .filter(col("id_a") < col("id_b")))
    // candidates materialized eagerly (like Dedup.probeIndex) — NOW the
    // index may grow; a lazily-evaluated return could otherwise race its
    // own append
    val out = all.localCheckpoint()
    appendBatch.foreach { id =>
      require(id.matches("[A-Za-z0-9_.-]+") && id != "base",
        s"batch id '$id' must be a plain path token and not the reserved 'base'")
      require(fs.exists(new Path(root, "_SUCCESS")),
        s"cannot append batch '$id': no complete MIH index at $indexPath")
      newlyHot.foreach { nh =>
        val part = new Path(root, s"_hot/batch=$id")
        if (!fs.exists(new Path(part, "_SUCCESS")))
          nh.write.mode("overwrite").parquet(part.toString)
      }
      val part = new Path(root, s"batch=$id")
      if (!fs.exists(new Path(part, "_SUCCESS")))
        batch.write.mode("overwrite").parquet(part.toString)
    }
    out
  }
}
