package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.text.Dedup

class IngestDedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // base corpus: two unrelated docs; batch 1 introduces doc 10; batch 2's
  // doc 20 near-dups doc 10 ONLY — the (10, 20) group can merge only if
  // batch 1's signatures grew the index AND its docs landed in the store
  // (the verify side must re-tokenize doc 10 from the store, not the feed)
  private val base = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"))
  private val b1 = Seq(
    (10L, "red orange yellow green blue indigo violet pink brown black white grey"))
  private val b2 = Seq(
    (20L, "red orange yellow green blue indigo violet pink brown black white silver"))
  private val p = IngestDedup.Params(n = 3, numHashes = 32, bands = 16,
    verifyThreshold = 0.5)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def readFeed(feed: String) =
    spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1) // one feed file = one micro-batch
      .parquet(feed)

  test("streamed two-batch ingest converges to the full-corpus labeling") {
    val (feed, docsP, idx, labelsP) =
      (tmp("ingest_feed"), tmp("ingest_docs") + "/docs",
        tmp("ingest_idx") + "/idx", tmp("ingest_labels") + "/labels")
    IngestDedup.ensureIngestState(base.toDF("doc_id", "text"),
      docsP, idx, labelsP, p)
    // bootstrap labels: every base doc a singleton
    assert(IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L), (2L, 2L)))

    // two feed files, landed in arrival order
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(feed)
    val ckpt = tmp("ingest_ckpt")
    val q = IngestDedup.runAvailable(readFeed(feed), docsP, idx, labelsP, ckpt, p)
    q.awaitTermination()

    val got = IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    // (10, 20) merged through the grown index; everything else singleton
    assert(got == Seq((1L, 1L), (2L, 2L), (10L, 10L), (20L, 10L)), got.toString)

    // ...and equals the full-corpus batch recompute (CC associativity)
    val all = (base ++ b1 ++ b2).toDF("doc_id", "text")
    val full = Dedup.dedupGroups(all.select("doc_id"),
        Dedup.minhashLshPairsPortable(all, p.n, p.numHashes, p.bands,
          p.verifyThreshold), "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == full)

    // the doc store carries base + both batches, partition per batch
    val store = spark.read.parquet(docsP)
    assert(store.select("batch").distinct().as[String].collect().sorted.toSeq ==
      Seq("b000000000", "b000000001", "b000000002"))
    assert(store.count() == 4)

    // a FRESH stream over the same feed (checkpoint gone, batch ids reset)
    // is a pure no-op: every version is already committed
    val before = IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    val q2 = IngestDedup.runAvailable(readFeed(feed), docsP, idx, labelsP,
      tmp("ingest_ckpt2"), p)
    q2.awaitTermination()
    assert(IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq == before)
    assert(store.count() == 4, "replay duplicated landed docs")
  }

  test("batch-mode processBatch is idempotent and skips a committed version") {
    val (docsP, idx, labelsP) = (tmp("bi_docs") + "/docs",
      tmp("bi_idx") + "/idx", tmp("bi_labels") + "/labels")
    IngestDedup.ensureIngestState(base.toDF("doc_id", "text"),
      docsP, idx, labelsP, p)
    IngestDedup.processBatch(b1.toDF("doc_id", "text"), 0L,
      docsP, idx, labelsP, p)
    IngestDedup.processBatch(b2.toDF("doc_id", "text"), 1L,
      docsP, idx, labelsP, p)
    val first = IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(first == Seq((1L, 1L), (2L, 2L), (10L, 10L), (20L, 10L)))
    // replaying batch 1 (even with different content — the commit record
    // wins) must not change anything
    IngestDedup.processBatch(b2.toDF("doc_id", "text"), 0L,
      docsP, idx, labelsP, p)
    assert(IngestDedup.labels(spark, labelsP).orderBy("id")
      .as[(Long, Long)].collect().toSeq == first)
  }

  test("labels before bootstrap throws instead of returning an empty frame") {
    val e = intercept[IllegalStateException] {
      IngestDedup.labels(spark, tmp("nolabels") + "/labels")
    }
    assert(e.getMessage.contains("ensureIngestState"))
  }
}
