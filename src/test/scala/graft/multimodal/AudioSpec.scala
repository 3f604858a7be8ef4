package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class AudioSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("wavBytes builds a canonical header decodeWav round-trips") {
    val samples = Array[Byte](100, (200 & 0xff).toByte, 50, 128.toByte)
    val wav = Audio.wavBytes(samples)
    assert(wav.length == 44 + 4)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(Audio.decodeWav(wav).get.toSeq == samples.toSeq)
  }

  test("decodeWav REJECTS structural corruption, SKIPS unknown chunks") {
    val good = Audio.wavBytes(Array[Byte](1, 2, 3, 4))
    assert(Audio.decodeWav(good).isDefined)
    // wrong outer magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Audio.decodeWav(badMagic).isEmpty)
    // data chunk declares more bytes than the payload carries
    assert(Audio.decodeWav(good.dropRight(1)).isEmpty)
    // stereo (channels=2) is rejected by the fmt gate
    val stereo = good.clone(); stereo(22) = 2
    assert(Audio.decodeWav(stereo).isEmpty)
    // 16-bit is rejected
    val wide = good.clone(); wide(34) = 16
    assert(Audio.decodeWav(wide).isEmpty)
    // an unknown LIST chunk between fmt and data is skipped, not fatal
    val withList = good.take(36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 7, 7) ++
      good.drop(36)
    assert(Audio.decodeWav(withList).get.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("extractWindows: windowing, integer energy, in-window zero crossings") {
    // 130 chars -> 3 windows: 64 + 64 + 2 samples
    val text = "ab" * 65
    val docs = Seq((5L, text, "en", "a", 130L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Audio.extractWindows(spark, docs).collect().sortBy(_.window_idx)
    assert(rows.map(w => (w.window_idx, w.n_samples)).toSeq ==
      Seq((0, 64), (1, 64), (2, 2)))
    // 'a'=97 -> d=-31, 'b'=98 -> d=-30: same sign, zero crossings = 0
    assert(rows.forall(_.zero_crossings == 0))
    assert(rows(0).energy == 32 * (31L * 31) + 32 * (30L * 30))
    assert(rows(2).energy == 31L * 31 + 30L * 30)
    // crossings count sign flips: '!'=33 (d=-95), 'á' is out of ASCII so
    // use '}'=125 (d=-3) and 0x90? stick to ASCII: '~'=126 (d=-2) vs
    // high byte via 'Ω' unavailable -> craft samples directly
    val wav = Audio.wavBytes(Array[Byte](100, (150 & 0xff).toByte, 100, (150 & 0xff).toByte))
    val s2 = Audio.decodeWav(wav).get
    var zc = 0
    (1 until s2.length).foreach { j =>
      if (((s2(j - 1) & 0xff) - 128) * ((s2(j) & 0xff) - 128) < 0) zc += 1
    }
    assert(zc == 3, "alternating below/above center flips sign every step")
  }

  test("segmentEnergyVector: equal-segment split, dense zeros, exact energies") {
    // 130 samples over 65 segments -> every segment gets exactly 2
    val text = "ab" * 65
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val Array((id, e)) = Audio.segmentEnergyVector(spark, docs).collect()
    assert(id == 5L && e.length == 65)
    // each segment = one 'a' (d=-31) + one 'b' (d=-30)
    assert(e.forall(_ == 31L * 31 + 30L * 30))
    // a short clip (3 samples over 65 segments) leaves most segments 0 —
    // densified, not absent; sample i lands in segment i*65/3
    val Array((_, e2)) = Audio.segmentEnergyVector(spark,
      Seq((6L, "abc")).toDF("doc_id", "text")).collect()
    assert(e2.length == 65 && e2.count(_ != 0) == 3)
    assert(e2(0) == 31L * 31 && e2(65 / 3) == 30L * 30 && e2(2 * 65 / 3) == 29L * 29)
  }

  test("subfingerprintWords: overlapping-frame energies, word fold, hop-shift invariance") {
    // deterministic clip long enough for several words:
    // win=32, hop=4 -> frames F = (n-32)/4+1, bits F-1, words bits-31
    val text = (0 until 400).map(i => ('a' + (i * 7 % 17)).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Audio.subfingerprintWords(spark, docs).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    val nF = (400 - 32) / 4 + 1
    assert(rows.length == (nF - 1) - 31, "one word per bit position")
    // independent recompute of word 0
    val d = text.map(c => (c.toInt - 128).toLong)
    def energy(f: Int) = (0 until 32).map(k => d(f * 4 + k) * d(f * 4 + k)).sum
    val bits = (0 until nF - 1).map(f => if (energy(f + 1) > energy(f)) 1L else 0L)
    assert(rows.head._2 == bits.take(32).foldLeft(0L)(_ * 2 + _))
    assert(rows.last._2 == bits.drop(bits.length - 32).foldLeft(0L)(_ * 2 + _))
    // THE offset-robustness property: trimming a whole number of hops
    // shifts the word sequence — every trimmed word exists in the
    // original BY VALUE (the hash-join key survives the offset)
    val trimmed = Audio.subfingerprintWords(spark,
      Seq((2L, text.substring(8))).toDF("doc_id", "text"))
      .collect().map(_.getLong(2)).toSet
    val orig = rows.map(_._2).toSet
    assert(trimmed.nonEmpty && trimmed.subsetOf(orig),
      "hop-aligned trim must preserve subfingerprint words by value")
    // too-short clips yield NO words (rejection, not padding)
    assert(Audio.subfingerprintWords(spark,
      Seq((3L, "a" * 100)).toDF("doc_id", "text")).count() == 0)
  }

  test("q_audio_offset_recall: sanity rows and the scheme ordering it measures") {
    val out = graft.SparkEntry.queries("q_audio_offset_recall")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 15, "5 offsets x 3 schemes")
    // offset 0 = the clip vs itself: every scheme recovers everything
    assert(out((0, "segment65"))._3 == 1.0)
    assert(out((0, "hk_words"))._3 == 1.0)
    assert(out((0, "hk_words_hop1"))._3 == 1.0)
    // the measurement's point: at hop-aligned offsets the word scheme
    // recovers pairs the rescaled segment fingerprint loses
    Seq(4, 8, 64).foreach { k =>
      assert(out((k, "hk_words"))._3 >= out((k, "segment65"))._3,
        s"offset $k: hk_words must dominate segment65")
    }
    assert(out((64, "hk_words"))._3 > 0.9,
      "hop-aligned trims survive the exact-word join")
    // the paper's 31/32-overlap framing (hop 1) makes EVERY integer trim
    // hop-aligned — including k=129, where hop 4's sub-hop misalignment
    // loses everything
    Seq(4, 8, 64, 129).foreach { k =>
      assert(out((k, "hk_words_hop1"))._3 == 1.0,
        s"offset $k: hop-1 words must recover every planted trim")
    }
    // same denominator everywhere
    assert(out.values.map(_._1).toSet.size == 1)
  }

  test("banded audio dedup equals brute-force Hamming <= 3 (sf0.001)") {
    // the 4x16 banding is pigeonhole-complete at Hamming <= 3: the query
    // must return EXACTLY the all-pairs threshold filter over the same
    // sibling-augmented corpus, fingerprints recomputed independently here
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_audio_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    import org.apache.spark.sql.functions._
    val sib = base.filter(pmod(col("doc_id"), lit(25L)) === 0L)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(
          substring(col("text"), lit(1),
            greatest(floor(length(col("text")) / 2), lit(1L)).cast("int") - 1),
          lit("x"),
          expr("substring(text, cast(greatest(floor(length(text) / 2), 1) as int) + 1)"))
          .as("text"))
    val fps = Audio.segmentEnergyVector(spark, base.union(sib)).collect()
      .map { case (id, e) =>
        val bits = (0 until 64).map(j => if (e(j + 1) > e(j)) 1L else 0L)
        id -> (bits.take(32).foldLeft(0L)(_ * 2 + _),
          bits.drop(32).foldLeft(0L)(_ * 2 + _))
      }
    val brute = (for {
      (a, (a1, a2)) <- fps; (b, (b1, b2)) <- fps if a < b
      h = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if h <= 3
    } yield (a, b, h)).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty, "the planted siblings must produce pairs at every SF")
  }
}
