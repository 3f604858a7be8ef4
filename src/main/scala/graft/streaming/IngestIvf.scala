package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.sim.Similarity

/** Continuous IVF ingest: embedding shards arrive as a stream and each
  * micro-batch assigns itself to the PERSISTED refined-centroid index
  * ([[Similarity.ensureCentroidIndex]]) — the similarity-side companion of
  * [[IngestDedup]], for the other standing artifact a training-data
  * pipeline maintains (a 100 TB embedding store partitioned into inverted
  * lists; new shards must land in the right lists without re-clustering
  * the corpus).
  *
  * Simpler transactional story than the dedup loop because assignments are
  * PER-VECTOR functions of the stored centroids — no cross-batch folding:
  * one store `assignsPath/batch=<v>/` (vec_id, cluster, dist), one
  * `_SUCCESS` guard per batch. An at-least-once replay recomputes the
  * identical rows (exact integer arithmetic) into the same partition —
  * convergent by construction. Per-batch cost is |batch|·k·dim through
  * one broadcast join; the driver only coordinates.
  */
object IngestIvf {

  private def version(batchId: Long): String = f"b${batchId + 1}%09d"

  private def committed(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new Path(p, "_SUCCESS"))
  }

  /** Bootstrap: build (once) the refined centroid index from the base
    * corpus. Idempotent — delegates to the index's own `_SUCCESS` guard.
    */
  def ensureIvfState(baseEmb: DataFrame, indexPath: String, k: Int,
                     iters: Int): Unit =
    Similarity.ensureCentroidIndex(
      baseEmb.select("vec_id", "embedding"), indexPath, k, iters)

  /** One micro-batch: assign against the stored centroids and land the
    * result under its batch partition, exactly once — PARTITIONED BY
    * CLUSTER, so the store IS the inverted-list layout: a probe of
    * nprobe lists reads nprobe/k of the directories (partition pruning
    * at the scan, no row filter), which is the point of IVF at 100 TB.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   assignsPath: String): Unit = {
    val s = batch.sparkSession
    val dir = s"$assignsPath/batch=${version(batchId)}"
    if (committed(s, dir)) return
    Similarity.assignToCentroidIndex(s, batch.select("vec_id", "embedding"),
        indexPath)
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)
  }

  /** Every assignment the loop has committed so far: (vec_id, cluster,
    * dist, batch) — the inverted-list membership table a probe consumes.
    * A `cluster` equality filter prunes to that list's DIRECTORIES
    * (spec-asserted). The cast pins the partition column back to BIGINT —
    * directory-name type inference would otherwise drift it to INT and
    * break schema parity with the batch path.
    */
  def assignments(s: SparkSession, assignsPath: String): DataFrame =
    s.read.parquet(assignsPath)
      .withColumn("cluster", col("cluster").cast("long"))

  /** Attach the loop to a streaming (vec_id, embedding) frame; the caller
    * picks trigger/checkpoint and starts it.
    */
  def attach(stream: DataFrame, indexPath: String,
             assignsPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexPath, assignsPath)
    }

  /** Drain the feed and stop (Trigger.AvailableNow) — catch-up mode. */
  def runAvailable(stream: DataFrame, indexPath: String, assignsPath: String,
                   checkpoint: String): StreamingQuery =
    attach(stream, indexPath, assignsPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
