package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.sim.{SignBandIndex, Similarity}

class IngestSemBandSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Clustered vectors (the SignBandIndexSpec fixture): a few random
    * bases, many small perturbations — high-cosine near-dups exist in
    * every mod-5 fifth, so the loop-closure assertions below cannot be
    * vacuously true. */
  private lazy val emb = {
    val rng = new scala.util.Random(19)
    val bases = Array.fill(5)(Array.fill(64)(rng.nextGaussian()))
    (0L until 150L).map { i =>
      val b = bases(rng.nextInt(bases.length))
      (i, b.map(x => (x + 0.15 * rng.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("streamed matches equal the ordered batch replay and replay is convergent") {
    val m = pmod(col("vec_id"), lit(5L))
    val root = Files.createTempDirectory("graft_semband_loop").toString
    val p = SignBandIndex.Params(numPlanes = 16, bands = 8)
    IngestSemBand.ensureState(emb.filter(m < 3), s"$root/idx", p)
    emb.filter(m === 3L).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(s"$root/feed")
    emb.filter(m === 4L).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(s"$root/feed")
    def drain(ckpt: String): Unit =
      IngestSemBand.runAvailable(
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1).parquet(s"$root/feed"),
        s"$root/idx", s"$root/matches", ckpt, p, threshold = 0.5)
        .awaitTermination()
    drain(s"$root/ckpt")
    def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("query_id", "vec_id", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = asSet(IngestSemBand.matches(spark, s"$root/matches"))
    assert(streamed.nonEmpty, "degenerate fixture: no streamed matches")
    // the checkpoint order fixes each batch's visible universe: batch 1
    // (m=3) sees the base; batch 2 (m=4) sees base ∪ batch 1 — the full
    // banded recompute restricted by that order equals the store
    val all = asSet(Similarity.semanticMatches(spark, emb,
      queryPred = pmod(col("vec_id"), lit(5L)) >= 3L, threshold = 0.5,
      numPlanes = 16, bands = 8))
    val want = all.filter { case (q, c, _) =>
      if (q % 5 == 3) c % 5 < 3 else c % 5 != 4
    }
    assert(streamed == want, s"streamed=${streamed.size} want=${want.size}")
    // batch 2 actually found a batch-1 arrival through the grown index
    assert(streamed.exists { case (q, c, _) => q % 5 == 4 && c % 5 == 3 },
      "loop closure never exercised: no batch2-vs-batch1 match")
    // at-least-once replay: a fresh checkpoint re-delivers every file;
    // the _SUCCESS guards skip, leaving the store byte-identical
    drain(s"$root/ckpt2")
    assert(asSet(IngestSemBand.matches(spark, s"$root/matches")) == streamed,
      "replay duplicated or changed matches")
  }
}
