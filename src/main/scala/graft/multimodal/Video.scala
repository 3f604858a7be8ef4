package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-modality plumbing (SURVEY.md §2.9 X4): the temporal sibling of
  * [[Media]]'s image path. A video payload is a SELF-DESCRIBING container
  * of concatenated binary PGM frames (the MJPEG idea on the one real
  * format this container ships a codec for): each frame is a complete
  * `P5\n<w> <h>\n255\n<raster>` unit, and [[parseFrames]] walks the
  * payload structurally — parse one header, skip exactly w·h raster
  * bytes, repeat until the payload is exhausted. A malformed frame header
  * ANYWHERE, a truncated raster, or trailing garbage rejects the WHOLE
  * payload (None — a rejection, not a guess), so no output field derives
  * from anything but validly decoded bytes.
  *
  * Frames are planted deterministically from the document's text
  * ([[FrameSide]]² chars per frame, '.'-padded — the [[Media]]
  * convention), so the DuckDB oracle reconstructs every frame, feature,
  * and shot boundary from the same characters.
  */
object Video {

  /** Planted frames are FrameSide×FrameSide rasters (64 pixels — small
    * enough that a typical document yields several frames, so the
    * temporal features are non-degenerate). */
  val FrameSide = 8

  val FramePixels: Int = FrameSide * FrameSide

  /** One decoded frame with its perceptual features: integer mean pixel,
    * the 64-bit average-hash over the frame's own raster as a '0'/'1'
    * string plus its two packed 32-bit halves (MSB-first fold, sign-free
    * in a long — the q_image_dedup verify convention).
    */
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                        mean_px: Int, fphash: String, h1: Long, h2: Long)

  /** Attach the video payload: ceil(len/64) (min 1) concatenated 8×8 PGM
    * frames sliced char-wise from the text, last frame '.'-padded. At
    * ingest these would be the raw container bytes; planting from `text`
    * keeps the payload deterministic AND oracle-reconstructible.
    */
  def withVideoColumn(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val planted = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, videoBytes(text)) }
      .toDF("doc_id", "video")
    docs.join(planted, "doc_id")
  }

  /** Build the canonical frame container for `text`. */
  def videoBytes(text: String): Array[Byte] = {
    val bytes = text.getBytes("US-ASCII")
    val nFrames = math.max(1, (bytes.length + FramePixels - 1) / FramePixels)
    val out = new java.io.ByteArrayOutputStream()
    val header = s"P5\n$FrameSide $FrameSide\n255\n".getBytes("US-ASCII")
    var f = 0
    while (f < nFrames) {
      out.write(header)
      var k = 0
      while (k < FramePixels) {
        val i = f * FramePixels + k
        out.write(if (i < bytes.length) bytes(i) else Media.PadPixel.toInt)
        k += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Structural container walk → every frame's (width, height, raster
    * offset), or None (whole-payload rejection) on a malformed header,
    * short raster, or trailing bytes that are not a complete frame.
    */
  def parseFrames(bytes: Array[Byte]): Option[Vector[(Int, Int, Int)]] = {
    var frames = Vector.empty[(Int, Int, Int)]
    var cursor = 0
    while (cursor < bytes.length) {
      Media.parsePgmAt(bytes, cursor) match {
        case Some((w, h, off)) =>
          frames = frames :+ ((w, h, off))
          cursor = off + w * h
        case None => return None
      }
    }
    if (frames.nonEmpty) Some(frames) else None
  }

  /** Per-frame DECODED raster strings (doc_id, frame_idx, raster) off the
    * structural container walk — the exact-content view the cross-doc
    * frame dedup fingerprints ([[frameFeatures]] is the perceptual view).
    * A payload [[parseFrames]] rejects yields no rows.
    */
  def frameRasters(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    withVideoColumn(s, docs)
      .select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFrames(bytes).toSeq.flatMap(_.zipWithIndex.map {
          case ((w, h, off), fi) =>
            (id, fi, new String(bytes, off, w * h, "US-ASCII"))
        })
      })
      .toDF("doc_id", "frame_idx", "raster")
  }

  /** Partition-wise per-frame feature extraction — the mapInPandas-shaped
    * hot path: executors stream (id, payload) batches through the
    * structural walk; a payload [[parseFrames]] rejects yields NO rows.
    * Per frame: integer mean pixel (sum div n) and the average-hash bits
    * (pixel > mean, MSB-first) both over the frame's own decoded raster.
    * All integer arithmetic, so the oracle replays it bit-for-bit.
    */
  def frameFeatures(s: SparkSession, docs: DataFrame): Dataset[VideoFrame] = {
    import s.implicits._
    withVideoColumn(s, docs)
      .select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFrames(bytes).toSeq.flatMap(_.zipWithIndex.map {
          case ((w, h, off), fi) =>
            val n = w * h
            var sum = 0L
            var k = 0
            while (k < n) { sum += (bytes(off + k) & 0xff); k += 1 }
            val mean = sum / n
            val bits = new StringBuilder(n)
            var h1 = 0L
            var h2 = 0L
            k = 0
            while (k < n) {
              val b = if ((bytes(off + k) & 0xff) > mean) 1L else 0L
              bits.append(if (b == 1L) '1' else '0')
              if (k < n / 2) h1 = h1 * 2 + b else h2 = h2 * 2 + b
              k += 1
            }
            VideoFrame(id, fi, w, h, mean.toInt, bits.toString, h1, h2)
        })
      })
  }
}
