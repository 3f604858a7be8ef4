package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The INGEST-LOOP form of banded sign-LSH similarity search: a persisted
  * (id, embedding, buckets) index over a vector corpus that arriving
  * batches probe — and grow — at |batch| + |candidates| cost, never
  * re-bucketing or re-scanning-to-shuffle the standing corpus.
  *
  * [[Similarity.semanticMatches]] is the batch-mode primitive (band
  * equi-join + first-shared-band dedup + exact-cosine verify). Its ingest
  * gap is the same one [[MihIndex]] closed for Hamming space: a new media
  * batch had to re-bucket the whole corpus per arrival. This store
  * completes the modality×ingest matrix — text LSH
  * ([[graft.text.Dedup.ensureBandIndex]]), perceptual-hash MIH
  * ([[MihIndex]]), centroid/PQ ([[Similarity.ensureCentroidIndex]] /
  * `ensurePqIndex`), and now the embedding-side near-dup probe:
  *
  *   - the index stores each vector WITH its per-band buckets, laid out
  *     as `path/batch=base/…` plus one `batch=<id>/` partition per
  *     ingested batch — the verify step reads the stored vectors, so a
  *     probe never recomputes a corpus feature;
  *   - a [[SpecFile]] sidecar (written LAST, after the data commit) pins
  *     bands, dim and the RESOLVED plane count. The plane width is
  *     frozen at build time from the base-corpus count
  *     ([[Similarity.adaptiveRowsPerBand]] — the adaptive-occupancy
  *     rule): later probes regenerate the identical
  *     [[Similarity.portablePlanes]] from the sidecar instead of
  *     re-deriving a width from a drifted corpus count, exactly how a
  *     production ANN index behaves (occupancy creeps up under appends
  *     until a rebuild re-widens — the documented trade);
  *   - appends are idempotent on the batch partition's own `_SUCCESS`,
  *     and a replayed batch's partition is pruned out of its own probe.
  *
  * Scale: per batch, the probe side is |batch|·bands slim rows
  * (broadcast under AQE against the index scan), the index side is
  * scanned once map-only (its stored buckets explode in place — no
  * corpus shuffle), candidates are bucket-occupancy-sized, and the
  * verify joins candidates to STORED vectors. Per-batch cost is
  * |batch| + |candidates|, measured by the store:semband_probe scale
  * row (fixed batch, corpus ×10).
  */
object SignBandIndex {

  /** Sidecar filename pinning the parameters the index was built with. */
  val SpecFile = "_graft_band_spec"

  /** Probe/build parameters: `numPlanes` is the BASE plane request
    * (bands × base-width); the build may widen it adaptively and the
    * sidecar records what was resolved.
    */
  final case class Params(numPlanes: Int = 16, bands: Int = 8, dim: Int = 64)

  private def specJson(planes: Int, p: Params): String =
    s"""{"planes":$planes,"bands":${p.bands},"dim":${p.dim}}"""

  private def fsOf(s: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Read the sidecar, validate bands/dim/base-width against `p`, and
    * return the resolved plane count. */
  private def resolvedPlanes(fs: org.apache.hadoop.fs.FileSystem, root: Path,
                             p: Params): Int = {
    val specPath = new Path(root, SpecFile)
    require(fs.exists(specPath),
      s"sign-band index at $root has no $SpecFile sidecar — not a graft " +
        "band index (or a pre-sidecar layout; rebuild with ensureIndex)")
    val in = fs.open(specPath)
    val stored =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val m = """\{"planes":(\d+),"bands":(\d+),"dim":(\d+)\}""".r
    stored match {
      case m(pl, b, d) =>
        require(b.toInt == p.bands && d.toInt == p.dim && pl.toInt >= p.numPlanes,
          s"sign-band index at $root was built with $stored but probed with " +
            s"planes>=${p.numPlanes}/bands=${p.bands}/dim=${p.dim} — pass the " +
            "build-time parameters or rebuild the index")
        pl.toInt
      case _ => throw new IllegalStateException(
        s"sign-band index sidecar at $root is unparseable: $stored")
    }
  }

  /** Materialize the banded index of a vector table at `path`
    * (idempotent: a complete index is left untouched). Input: `emb` with
    * (idCol, embedding: array<float> of length dim). The plane width is
    * resolved HERE from the base-corpus count and frozen in the sidecar.
    */
  def ensureIndex(emb: DataFrame, idCol: String, path: String,
                  p: Params): Unit = {
    require(p.numPlanes % p.bands == 0,
      s"numPlanes=${p.numPlanes} must be a multiple of bands=${p.bands}")
    val s = emb.sparkSession
    val (fs, root) = fsOf(s, path)
    val done = new Path(root, "_SUCCESS")
    val spec = new Path(root, SpecFile)
    if (fs.exists(done) && fs.exists(spec)) {
      resolvedPlanes(fs, root, p) // validates
    } else {
      val base = p.numPlanes / p.bands
      val rows = math.max(base,
        Similarity.adaptiveRowsPerBand(emb.count(), base = base))
      val planes = p.bands * rows
      val pl = Similarity.portablePlanes(planes, p.dim)
      Similarity.withLshBuckets(
          emb.select(col(idCol).as("id"), col("embedding")), pl, p.bands)
        .select(col("id"), col("embedding"), col("buckets"))
        .withColumn("batch", lit("base"))
        .write.mode("overwrite").partitionBy("batch").parquet(path)
      val out = fs.create(spec, true)
      try out.write(specJson(planes, p).getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Banded matches of an arriving vector batch against a corpus whose
    * index was persisted by [[ensureIndex]]: the batch is bucketed with
    * the INDEX'S frozen planes (sidecar), band-equi-joined against the
    * stored buckets (first-shared-band dedup — no distinct over the
    * candidate stream), and every candidate is verified with the exact
    * codegen'd cosine against the STORED vector. Per-vector buckets are
    * pure functions of the vector and the frozen planes, so the result
    * provably equals the full-corpus [[Similarity.semanticMatches]] over
    * corpus ∪ batch (at the same plane set) restricted to pairs with a
    * batch side — spec-asserted — but the work scales with
    * |batch| + |candidates|, not |corpus|.
    *
    * Returns (query_id, vec_id, sim ≥ threshold): query_id is always the
    * batch side; `includeInternal` adds the batch's own internal matches
    * once each (query_id < vec_id).
    *
    * `appendBatch = Some(id)` CLOSES the loop: the batch's (id, vector,
    * buckets) rows are appended as a `batch=<id>/` partition, idempotent
    * on its `_SUCCESS`, and a replayed batch's partition is pruned out of
    * its own probe (partition-pruned scan — free).
    */
  def ingestMatches(batchEmb: DataFrame, idCol: String, indexPath: String,
                    p: Params, threshold: Double,
                    appendBatch: Option[String] = None,
                    includeInternal: Boolean = false): DataFrame = {
    val s = batchEmb.sparkSession
    val (fs, root) = fsOf(s, indexPath)
    val planes = resolvedPlanes(fs, root, p)
    val pl = Similarity.portablePlanes(planes, p.dim)
    val batch = Similarity.withLshBuckets(
        batchEmb.select(col(idCol).as("id"), col("embedding")), pl, p.bands)
      .select(col("id"), col("embedding"), col("buckets"))
      .localCheckpoint()
    val index = appendBatch.foldLeft(s.read.parquet(indexPath)) {
      (ix, id) => ix.filter(col("batch") =!= id)
    }.select("id", "embedding", "buckets")
    def exploded(df: DataFrame): DataFrame =
      df.select(col("id"), col("embedding"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bkt")))
    def matched(q: DataFrame, c: DataFrame, canonical: Boolean): DataFrame = {
      val idCond: Column =
        if (canonical) col("q.id") < col("c.id") else col("q.id") =!= col("c.id")
      exploded(q).as("q")
        .join(exploded(c).as("c"),
          col("q.band") === col("c.band") && col("q.bkt") === col("c.bkt") && idCond)
        .filter(Similarity.firstSharedBand("q", "c", p.bands))
        .select(col("q.id").as("query_id"), col("c.id").as("vec_id"),
          graft.functions.Vectors.cosineSim(s, "q.embedding", "c.embedding")
            .as("sim"))
        .filter(col("sim") >= threshold)
    }
    val mixed = matched(batch, index, canonical = false)
    val all =
      if (!includeInternal) mixed
      else mixed.union(matched(batch, batch, canonical = true))
    // candidates materialized eagerly — NOW the index may grow; a lazy
    // return could otherwise race its own append
    val out = all.localCheckpoint()
    appendBatch.foreach { id =>
      require(id.matches("[A-Za-z0-9_.-]+") && id != "base",
        s"batch id '$id' must be a plain path token and not the reserved 'base'")
      require(fs.exists(new Path(root, "_SUCCESS")),
        s"cannot append batch '$id': no complete sign-band index at $indexPath")
      val part = new Path(root, s"batch=$id")
      if (!fs.exists(new Path(part, "_SUCCESS")))
        batch.write.mode("overwrite").parquet(part.toString)
    }
    out
  }
}
