package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-modality plumbing (SURVEY.md §2.9 X4): the audio sibling of
  * [[Media]]'s image path. Payloads are REAL canonical WAV files — a
  * 44-byte RIFF/WAVE header (PCM, mono, 8 kHz, 8-bit unsigned) followed
  * by the sample bytes — planted deterministically from each document's
  * text so the DuckDB oracle can recompute every feature from the same
  * bytes. [[decodeWav]] is a genuine structural parser: it validates the
  * RIFF/WAVE magics, walks the chunk list (skipping unknown chunks, as a
  * real reader must), requires PCM/mono/8-bit from the fmt chunk, and
  * rejects payloads whose data chunk disagrees with its declared length.
  * Features are pure integers (per-window Σ(s−128)² energy and
  * zero-crossing counts), so the oracle replay is bit-exact.
  */
object Audio {

  /** Per-window feature row: fixed 64-sample windows, last window ragged. */
  case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Int,
                         energy: Long, zero_crossings: Int)

  val WindowSamples = 64

  private def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leShort(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Build the canonical 44-byte-header PCM WAV around `samples`. */
  def wavBytes(samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    "RIFF".getBytes("US-ASCII") ++ leInt(36 + n) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ leInt(16) ++
      leShort(1) ++ leShort(1) ++ // PCM, mono
      leInt(8000) ++ leInt(8000) ++ // sample rate, byte rate
      leShort(1) ++ leShort(8) ++ // block align, bits per sample
      "data".getBytes("US-ASCII") ++ leInt(n) ++ samples
  }

  /** Attach the audio payload: samples are the document's text bytes (at
    * ingest these would be the raw file bytes; planting from `text` keeps
    * the payload deterministic AND oracle-reconstructible).
    */
  def withAudioColumn(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val planted = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, wavBytes(text.getBytes("US-ASCII"))) }
      .toDF("doc_id", "audio")
    docs.join(planted, "doc_id")
  }

  private def leIntAt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def leShortAt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def magicAt(b: Array[Byte], i: Int, m: String): Boolean =
    b.length >= i + 4 && new String(b.slice(i, i + 4), "US-ASCII") == m

  /** Structural WAV parse → the PCM sample bytes, or None (rejection) on
    * wrong magics, a fmt chunk that is not PCM/mono/8-bit, a data chunk
    * whose declared length overruns the payload, or no data chunk at all.
    * Unknown chunks are SKIPPED by their declared size (LIST/INFO tags in
    * real files), as any compliant reader does.
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!magicAt(bytes, 0, "RIFF") || bytes.length < 12) return None
    if (!magicAt(bytes, 8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    var data: Option[Array[Byte]] = None
    while (i + 8 <= bytes.length) {
      val id = new String(bytes.slice(i, i + 4), "US-ASCII")
      val size = leIntAt(bytes, i + 4)
      if (size < 0 || i + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = leShortAt(bytes, i + 8)
          val channels = leShortAt(bytes, i + 10)
          val bits = leShortAt(bytes, i + 22)
          if (audioFormat != 1 || channels != 1 || bits != 8) return None
          fmtOk = true
        case "data" =>
          data = Some(bytes.slice(i + 8, i + 8 + size))
        case _ => () // skip unknown chunk
      }
      i += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    if (fmtOk) data else None
  }

  /** Per-window integer features over the DECODED samples: energy =
    * Σ(s−128)² (8-bit unsigned PCM centers at 128) and zero crossings
    * (adjacent-sample sign products < 0, within the window). Partition-
    * wise batch transform — the mapInPandas-shaped hot path, executors
    * never ship raw audio to the driver; structurally invalid payloads
    * are rejected (dropped), like [[Media.extractFeatures]].
    */
  /** Per-document EQUAL-SEGMENT energy vector off the decoded samples:
    * sample i belongs to segment i·segments div n (sizes differ by ≤1 —
    * the fixed-band split of clip-level audio fingerprints, robust to
    * clip length where fixed-width windows leave short clips with
    * degenerate all-zero tails), energy = Σ(s−128)² per segment, empty
    * segments 0. One map-only pass, one dense `segments`-long array per
    * doc — no shuffle; payloads [[decodeWav]] rejects yield no row.
    * The audio-fingerprint entry derives its delta bits from this.
    */
  def segmentEnergyVector(s: SparkSession, docs: DataFrame,
                          segments: Int = 65): Dataset[(Long, Array[Long])] = {
    import s.implicits._
    withAudioColumn(s, docs)
      .select(col("doc_id"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).map { samples =>
          val e = new Array[Long](segments)
          val n = samples.length
          var i = 0
          while (i < n) {
            val d = (samples(i) & 0xff) - 128
            e((i.toLong * segments / n).toInt) += d.toLong * d
            i += 1
          }
          (id, e)
        }
      })
  }

  /** Overlapping-frame subfingerprint words — Haitsma–Kalker's ACTUAL
    * framing (ISMIR 2002 uses frames with large overlap precisely so a
    * clip cut mid-frame still nearly aligns with SOME original frame):
    * frame f covers samples [f·hop, f·hop + win), energy = Σ(s−128)²
    * (computed off one prefix-sum pass), bit_f = E_{f+1} > E_f, and every
    * 32 consecutive bits pack MSB-first into one BIGINT subfingerprint
    * word at each bit position. Two clips sharing audio match by sharing
    * exact WORDS (a hash-join key — the paper's lookup-table primitive),
    * which is offset-robust BY VALUE: a trim of k ≡ 0 (mod hop) samples
    * shifts the whole bit sequence, and the shifted words still collide
    * exactly, where the 65-equal-segment clip fingerprint
    * ([[segmentEnergyVector]]) rescales every boundary and loses the
    * pair. Sub-hop offsets perturb each energy by at most win/hop sample
    * swaps — bits near energy ties flip, and recall degrades with the
    * per-bit error rate, measured as data by q_audio_offset_recall.
    *
    * Returns (doc_id, pos, word): pos = the word's first bit index.
    * Clips too short for one full word (< win + hop·(31+1) samples)
    * yield no rows — rejection, not padding, like every decoder here.
    */
  def subfingerprintWords(s: SparkSession, docs: DataFrame, win: Int = 32,
                          hop: Int = 4): DataFrame = {
    import s.implicits._
    withAudioColumn(s, docs)
      .select(col("doc_id"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).toSeq.flatMap { smp =>
          val n = smp.length
          val nF = if (n < win) 0 else (n - win) / hop + 1
          if (nF < 33) Seq.empty
          else {
            val pre = new Array[Long](n + 1)
            var i = 0
            while (i < n) {
              val d = (smp(i) & 0xff) - 128
              pre(i + 1) = pre(i) + d.toLong * d
              i += 1
            }
            val bits = new Array[Int](nF - 1)
            var f = 0
            while (f < nF - 1) {
              val e0 = pre(f * hop + win) - pre(f * hop)
              val e1 = pre((f + 1) * hop + win) - pre((f + 1) * hop)
              bits(f) = if (e1 > e0) 1 else 0
              f += 1
            }
            var w = 0L
            var j = 0
            while (j < 32) { w = w * 2 + bits(j); j += 1 }
            val out = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long)](
              bits.length - 31)
            out += ((id, 0, w))
            j = 32
            while (j < bits.length) {
              w = ((w << 1) & 0xFFFFFFFFL) | bits(j)
              out += ((id, j - 31, w))
              j += 1
            }
            out
          }
        }
      })
      .toDF("doc_id", "pos", "word")
  }

  def extractWindows(s: SparkSession, docs: DataFrame): Dataset[AudioWindow] = {
    import s.implicits._
    withAudioColumn(s, docs)
      .select(col("doc_id"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).toSeq.flatMap { samples =>
          samples.grouped(WindowSamples).zipWithIndex.map { case (w, wi) =>
            var energy = 0L
            var zc = 0
            var j = 0
            while (j < w.length) {
              val d = (w(j) & 0xff) - 128
              energy += d.toLong * d
              if (j > 0) {
                val prev = (w(j - 1) & 0xff) - 128
                if (prev * d < 0) zc += 1
              }
              j += 1
            }
            AudioWindow(id, wi, w.length, energy, zc)
          }
        }
      })
  }
}
