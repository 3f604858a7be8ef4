package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.9 X4): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as a partition-wise batch transform (the Scala analog of
  * `mapInPandas` — one iterator per partition, vectorizable batch shape).
  *
  * The container ships no codecs, so the DECODE STEP IS A DETERMINISTIC
  * STUB (byte histogram + pseudo-dimensions); the Spark-side plumbing —
  * binary schema, partition-wise batching, fixed-shape `array<float>`
  * feature output — is real and tested.
  */
object Media {

  /** One extracted-feature row. Fixed-shape features (8 bins) — a stand-in
    * for a decoder+embedder output.
    */
  case class MediaFeature(doc_id: Long, modality: String, width: Int,
                          height: Int, features: Array[Float])

  /** Attach the opaque media payload (here: UTF-8 bytes of `text` standing
    * in for image bytes) — at ingest this would be the raw file bytes.
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** Typed metadata over the binary payload — size + content hash, both
    * engine-portable (oracle-checkable).
    */
  def metadata(docs: DataFrame): DataFrame =
    withMediaColumn(docs).select(
      col("doc_id"),
      octet_length(col("media")).as("n_bytes"),
      sha2(col("media"), 256).as("sha"))

  /** STUB decoder: deterministic fake "decode" of a media payload.
    * Real pipeline: decode image -> resize -> CNN/CLIP features. Here:
    * 8-bin byte histogram (L1-normalized) + pseudo width/height from the
    * payload size. Pure function of the bytes — stable across runs.
    */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeature = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / 32) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < 8) { hist(j) /= n; j += 1 }
    MediaFeature(id, "image", width = 16 + (bytes.length % 64),
      height = 16 + ((bytes.length / 64) % 64), features = hist)
  }

  /** X4 frame sampling: slice the payload stream at a fixed stride and
    * fingerprint each sampled frame — the video analog of "every Nth
    * frame". Declarative (explode over a generated frame index +
    * codegen'd portable hash), so Catalyst parallelizes it like any scan
    * transform; a real decoder would swap into the fingerprint step. The
    * payload here is the UTF-8 text stand-in, sliced char-wise so the
    * DuckDB oracle (char-based substring) agrees; byte-stride slicing of
    * a true binary blob is the same plan over `substring(media, ...)`.
    */
  def frameSample(s: SparkSession, docs: DataFrame,
                  stride: Int = 256, frameLen: Int = 64): DataFrame = {
    graft.functions.TextHash.register(s)
    // greatest(len, 1): an empty payload must yield exactly ONE empty frame
    // on both engines — with a raw (len-1) bound Spark's sequence(0, -1)
    // auto-steps BACKWARDS ([0,-1]) while DuckDB's range(0, 0) is empty,
    // and the oracle would diverge on the first empty document.
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((greatest(length(col("text")), lit(1)) - 1) / stride).cast("int")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        graft.text.TextOps.mixedOf(graft.functions.TextHash.portableHash(
          expr(s"substring(text, frame_idx * $stride + 1, $frameLen)"))).as("frame_fp"),
        least(lit(frameLen), length(col("text")) - col("frame_idx") * lit(stride))
          .as("frame_chars"))
  }

  /** Partition-wise feature extraction — the mapInPandas-shaped hot path:
    * executors stream batches of (id, payload) through the decoder without
    * driver involvement; output schema is fixed so downstream joins/aggs
    * plan normally.
    */
  def extractFeatures(s: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import s.implicits._
    withMediaColumn(docs)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }
}
