package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The video container contract: the payload is SELF-DESCRIBING
  * (concatenated complete PGM frames), the walk is structural, and one
  * malformed frame anywhere rejects the whole payload — no feature row
  * may derive from bytes the parser didn't validate.
  */
class VideoSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("videoBytes plants ceil(len/64) frames that parseFrames round-trips") {
    val v = Video.videoBytes("ab" * 65) // 130 chars -> 3 frames
    val frames = Video.parseFrames(v).get
    assert(frames.length == 3)
    assert(frames.forall { case (w, h, _) => w == 8 && h == 8 })
    // last frame is '.'-padded: 130 = 2*64 + 2 text chars
    val (_, _, off) = frames(2)
    assert(new String(v.slice(off, off + 64), "US-ASCII") == "ab" + "." * 62)
    // empty text still yields exactly one (all-pad) frame
    assert(Video.parseFrames(Video.videoBytes("")).get.length == 1)
  }

  test("parseFrames REJECTS a malformed frame anywhere, and trailing junk") {
    val good = Video.videoBytes("xy" * 96) // 3 frames
    assert(Video.parseFrames(good).isDefined)
    // corrupt the SECOND frame's magic: whole payload rejected
    val frame2 = 76 // header(12) + raster(64) = one frame
    val badMagic = good.clone(); badMagic(frame2) = 'X'
    assert(Video.parseFrames(badMagic).isEmpty)
    // truncated final raster
    assert(Video.parseFrames(good.dropRight(1)).isEmpty)
    // trailing garbage after the last complete frame
    assert(Video.parseFrames(good :+ 'Z'.toByte).isEmpty)
    // an empty payload is not a video
    assert(Video.parseFrames(Array.emptyByteArray).isEmpty)
  }

  test("frameFeatures: integer mean and average-hash bits off the raster") {
    // one frame of alternating 'a'(97)/'b'(98): mean = 6240/64 = 97 (div),
    // bit = px > 97 -> exactly the 'b' positions (odd indices)
    val docs = Seq((9L, "ab" * 32)).toDF("doc_id", "text")
    val rows = Video.frameFeatures(spark, docs).collect()
    assert(rows.length == 1)
    val f = rows.head
    assert(f.width == 8 && f.height == 8 && f.mean_px == 97)
    assert(f.fphash == "01" * 32)
    val expected = (0 until 32).map(k => if (k % 2 == 1) 1L else 0L)
    assert(f.h1 == expected.foldLeft(0L)(_ * 2 + _))
    assert(f.h2 == f.h1, "both halves carry the same alternating pattern")
  }

  test("frameFeatures emits NO rows for a payload the walk rejects") {
    // plant a doc, then corrupt its payload through a direct map — the
    // extraction must drop it rather than guess
    val docs = Seq((1L, "hello world " * 20)).toDF("doc_id", "text")
    val corrupted = Video.withVideoColumn(spark, docs)
      .select($"doc_id", $"video").as[(Long, Array[Byte])]
      .map { case (id, v) => val b = v.clone(); b(0) = 'X'; (id, b) }
      .toDF("doc_id", "video")
    import org.apache.spark.sql.functions._
    val viaParse = corrupted.as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (_, b) => Video.parseFrames(b) })
    assert(viaParse.count() == 0)
    // and the happy path over the same docs does emit frames
    assert(Video.frameFeatures(spark, docs).count() == 4) // 240 chars -> 4 frames
  }

  test("frameRasters returns the exact decoded 64-char frames in order") {
    val docs = Seq((7L, "ab" * 65)).toDF("doc_id", "text") // 130 chars, 3 frames
    val rows = Video.frameRasters(spark, docs).collect()
      .map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    // 64 is even, so frame 1 starts on an 'a' again
    assert(rows(0)._2 == "ab" * 32 && rows(1)._2 == "ab" * 32)
    assert(rows(2)._2 == "ab" + "." * 62)
  }

  test("q_video_dedup equals brute-force frame-set containment (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_video_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent brute force over the same sibling-augmented corpus:
    // per doc the DISTINCT set of '.'-padded 64-char frame strings,
    // pairs kept at |A ∩ B| / min(|A|, |B|) >= 0.5
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val aug = base ++ base.filter(_._1 % 25 == 0).map { case (id, t) =>
      val p = math.max(t.length / 2, 1)
      (id + 1000000L, t.substring(0, p - 1) + "x" + t.substring(p))
    }
    val frameSets = aug.map { case (id, t) =>
      val n = math.max(1, (t.length + 63) / 64)
      id -> (0 until n).map { f =>
        t.slice(f * 64, (f + 1) * 64).padTo(64, '.').mkString
      }.toSet
    }
    val brute = (for {
      (a, fa) <- frameSets; (b, fb) <- frameSets if a < b
      shared = fa.intersect(fb).size
      if shared.toDouble / math.min(fa.size, fb.size) >= 0.5
    } yield (a, b) -> shared.toLong).toMap
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty, "the planted siblings must produce pairs at every SF")
  }

  test("q_video_dedup_lossy equals brute-force per-frame Hamming (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_video_dedup_lossy")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent brute force: lossy corpus (32nd char of each full
    // 64-char frame -> '~'), per-frame average-hash halves, blank frames
    // (h1=h2=0) excluded, distinct hashes per doc, all-pairs frame match
    // at Hamming <= 3, pair gate min(ma, mb) / min(|A|, |B|) >= 0.5
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val aug = base ++ base.filter(_._1 % 25 == 0).map { case (id, t) =>
      val sb = new StringBuilder(t)
      var f = 0
      while ((f + 1) * 64 <= t.length) { sb.setCharAt(f * 64 + 31, '~'); f += 1 }
      (id + 2000000L, sb.toString)
    }
    def phash(frame: String): (Long, Long) = {
      val px = frame.map(_.toInt)
      val mean = px.map(_.toLong).sum / 64
      val bits = px.map(p => if (p > mean) 1L else 0L)
      (bits.take(32).foldLeft(0L)(_ * 2 + _), bits.drop(32).foldLeft(0L)(_ * 2 + _))
    }
    val hashSets = aug.map { case (id, t) =>
      val n = math.max(1, (t.length + 63) / 64)
      id -> (0 until n).map { f =>
        phash(t.slice(f * 64, (f + 1) * 64).padTo(64, '.').mkString)
      }.filter { case (h1, h2) => h1 != 0L || h2 != 0L }.toSet
    }.filter(_._2.nonEmpty)
    // the df cap (32) is part of the operator contract: a pair qualifies
    // only through a half within 1 flip whose key is COOL on both sides
    val occ1 = hashSets.flatMap(_._2.map(_._1)).groupBy(identity).map { case (k, v) => k -> v.size }
    val occ2 = hashSets.flatMap(_._2.map(_._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    def cool1(h: Long) = occ1(h) <= 32
    def cool2(h: Long) = occ2(h) <= 32
    def near(a: (Long, Long), b: (Long, Long)) = {
      val d1 = java.lang.Long.bitCount(a._1 ^ b._1)
      val d2 = java.lang.Long.bitCount(a._2 ^ b._2)
      ((d1 <= 1 && cool1(a._1) && cool1(b._1)) ||
        (d2 <= 1 && cool2(a._2) && cool2(b._2))) && d1 + d2 <= 3
    }
    val brute = (for {
      (a, fa) <- hashSets; (b, fb) <- hashSets if a < b
      ma = fa.count(x => fb.exists(near(x, _)))
      mb = fb.count(x => fa.exists(near(x, _)))
      m = math.min(ma, mb)
      if m.toDouble / math.min(fa.size, fb.size) >= 0.5
    } yield (a, b) -> m.toLong).toMap
    assert(got == brute, s"mih=${got.size} brute=${brute.size}")
    // the lossy siblings are the query's reason to exist: their frames
    // are never byte-identical, yet the perceptual match recovers them
    val planted = base.map(_._1).filter(_ % 25 == 0).toSet
    val recovered = planted.count(d => got.contains((d, d + 2000000L)))
    assert(recovered >= (planted.size * 4) / 5,
      s"only $recovered/${planted.size} planted lossy siblings recovered")
    // and the planted pairs are INVISIBLE to exact-content matching:
    // every FULL frame is perturbed, so byte-identical sharing is at most
    // the one partial tail frame — always under the 0.5 containment gate
    val frameSets = aug.toMap.map { case (id, t) =>
      val n = math.max(1, (t.length + 63) / 64)
      id -> (0 until n).map(f =>
        t.slice(f * 64, (f + 1) * 64).padTo(64, '.').mkString).toSet
    }
    // (docs under 129 chars have <= 1 full frame — their untouched
    // partial tail can legitimately reach the 0.5 exact gate, so the
    // invisibility claim applies to multi-full-frame docs)
    val longEnough = base.filter { case (id, t) =>
      id % 25 == 0 && t.length >= 129 }.map(_._1)
    longEnough.foreach { d =>
      val (fa, fb) = (frameSets(d), frameSets(d + 2000000L))
      val shared = fa.intersect(fb).size
      assert(shared.toDouble / math.min(fa.size, fb.size) < 0.5,
        s"planted lossy pair ($d) still shares $shared exact frames")
    }
    assert(longEnough.nonEmpty)
  }

  test("q_video_features temporal layer: first frame is a boundary, lag is dense") {
    val df = graft.SparkEntry.queries("q_video_features")(
      spark, "/root/testdata/sf0.001").collect()
    assert(df.nonEmpty)
    val byDoc = df.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.head.getInt(6) == -1 && sorted.head.getBoolean(7),
        "frame 0 must carry the -1 sentinel and flag a boundary")
      sorted.tail.foreach { r =>
        val h = r.getInt(6)
        assert(h >= 0 && h <= 64)
        assert(r.getBoolean(7) == (h >= 16))
      }
      // frame indices are dense 0..n-1
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq)
    }
  }
}
