package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class MediaSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "a", 11L),
    (2L, "another document body", "en", "a", 21L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("metadata exposes byte length and sha over the binary payload") {
    val got = Media.metadata(docs).orderBy("doc_id")
      .as[(Long, Int, String)].collect()
    assert(got(0)._2 == 11) // "hello world" UTF-8 bytes
    assert(got(0)._3.matches("[0-9a-f]{64}"))
    assert(got(0)._3 != got(1)._3)
  }

  test("fakeDecode is deterministic and produces an L1-normalized histogram") {
    val bytes = "hello world".getBytes("UTF-8")
    val f1 = Media.fakeDecode(1L, bytes)
    val f2 = Media.fakeDecode(1L, bytes)
    assert(f1.features.toSeq == f2.features.toSeq)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-6)
    assert(f1.features.length == 8)
  }

  test("frameSample emits stride-aligned frames with deterministic fingerprints") {
    // 300-char payload, stride 100, frame 40: frames at 0/100/200
    val long = Seq((9L, "ab" * 150, "en", "a", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Media.frameSample(spark, long, stride = 100, frameLen = 40)
      .orderBy("frame_idx").as[(Long, Int, Long, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(0, 1, 2))
    assert(got.forall(_._4 == 40))
    // identical frame content ("ab"*20 at every offset) => identical fp
    assert(got.map(_._3).distinct.size == 1)
    val again = Media.frameSample(spark, long, stride = 100, frameLen = 40)
      .orderBy("frame_idx").as[(Long, Int, Long, Int)].collect().toSeq
    assert(got == again)
  }

  test("frameSample emits exactly one zero-length frame for an empty payload") {
    val empty = Seq((5L, "", "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Media.frameSample(spark, empty)
      .as[(Long, Int, Long, Int)].collect().toSeq
    assert(got == Seq((5L, 0, 0L, 0)))
  }

  test("extractFeatures runs partition-wise with a fixed output schema") {
    val ds = Media.extractFeatures(spark, docs)
    val rows = ds.collect().sortBy(_.doc_id)
    assert(rows.length == 2)
    assert(rows.forall(_.modality == "image"))
    assert(rows.forall(_.features.length == 8))
    assert(ds.toDF().schema.fieldNames.toSeq ==
      Seq("doc_id", "modality", "width", "height", "features"))
  }
}
