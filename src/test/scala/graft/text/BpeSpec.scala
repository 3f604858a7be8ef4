package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class BpeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("merges learn the hand-computed pair sequence on a tiny corpus") {
    // vocab: aa×3 ("a a"), ab×1 ("a b")
    // round 1: (a,a)=3 beats (a,b)=1 → merge (a,a); aa → "aa"
    // round 2: only (a,b)=1 remains → merge (a,b); ab → "ab"
    // round 3: no pairs left → no merge emitted (exhaustion is empty,
    // not an error)
    val docs = Seq((1L, "aa ab aa"), (2L, "aa")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "a", "a", 3L), (2, "a", "b", 1L)))
  }

  test("foldMerge is leftmost-greedy and never re-fuses a fused symbol") {
    val df = Seq("a a a", "a a a a", "b a a", "a b a").toDF("syms")
    val got = df.select(Bpe.foldMerge(
        org.apache.spark.sql.functions.col("syms"),
        org.apache.spark.sql.functions.lit("a"),
        org.apache.spark.sql.functions.lit("a")).as("m"))
      .as[String].collect().toSeq
    assert(got == Seq("aa a", "aa aa", "b aa", "a b a"))
  }

  test("encodeCounts re-segments with the learned merges (hand-computed)") {
    // after (a,a) then (a,b): aa → 1 symbol, ab → 1 symbol
    val docs = Seq((1L, "aa ab aa"), (2L, "aa")).toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("encodeCounts is bounded by chars below and words above on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = Bpe.encodeCounts(docs, rounds = 3)
    val joined = docs
      .select($"doc_id",
        org.apache.spark.sql.functions.size(TextOps.tokens($"text")).cast("long").as("n_tok"))
      .join(b, "doc_id").select("doc_id", "n_tok", "n_bpe")
      .as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nTok, nBpe) =>
      // merges only ever shrink symbol counts, never below one per word
      assert(nBpe >= nTok, s"doc $id: $nBpe BPE symbols < $nTok words")
    }
  }

  test("merge frequencies are non-increasing across rounds on real data") {
    // a pair created by a merge occurs at most as often as the merge
    // itself, so the argmax sequence cannot rise — the classic BPE
    // training invariant
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val freqs = Bpe.merges(docs, rounds = 3)
      .orderBy("round").select("freq").as[Long].collect().toSeq
    assert(freqs.length == 3)
    assert(freqs == freqs.sorted.reverse, s"freqs rose across rounds: $freqs")
    assert(freqs.last > 0)
  }
}
