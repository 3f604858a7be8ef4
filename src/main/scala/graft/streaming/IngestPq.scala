package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.sim.Similarity

/** Continuous PQ encode: embedding shards arrive as a stream and each
  * micro-batch encodes itself against the PERSISTED codebook
  * ([[Similarity.ensurePqIndex]]) — the compressed-store companion of
  * [[IngestIvf]]: where that loop maintains inverted-list membership,
  * this one maintains the CODE table (m small codes per vector, the
  * 20×-smaller scan surface every ADC query reads instead of raw
  * vectors), and new shards must append to it without retraining.
  *
  * The same transactional story as the IVF loop: codes are PER-VECTOR
  * functions of the stored codebook — no cross-batch folding; one store
  * `codesPath/batch=<v>/` (vec_id, sub, cluster, dist) with a `_SUCCESS`
  * guard per batch. An at-least-once replay recomputes the identical rows
  * (exact integer arithmetic) into the same partition — convergent by
  * construction. Codes land PARTITIONED BY SUB, so a per-subspace ADC
  * lookup join prunes to that subspace's directories at the scan.
  * Per-batch cost is |batch|·m·k·(dim/m) through one broadcast join.
  */
object IngestPq {

  private def version(batchId: Long): String = f"b${batchId + 1}%09d"

  private def committed(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new Path(p, "_SUCCESS"))
  }

  /** Bootstrap: train (once) the codebook from the base corpus.
    * Idempotent — delegates to the index's own `_SUCCESS`+sidecar guard.
    */
  def ensurePqState(baseEmb: DataFrame, indexPath: String, m: Int, k: Int,
                    iters: Int): Unit =
    Similarity.ensurePqIndex(
      baseEmb.select("vec_id", "embedding"), indexPath, m, k, iters)

  /** One micro-batch: encode against the stored codebook and land the
    * codes under this batch's partition, exactly once. */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
                   codesPath: String, m: Int): Unit = {
    val s = batch.sparkSession
    val dir = s"$codesPath/batch=${version(batchId)}"
    if (committed(s, dir)) return
    Similarity.encodeWithPqIndex(s, batch.select("vec_id", "embedding"),
        indexPath, m)
      .write.mode("overwrite").partitionBy("sub").parquet(dir)
  }

  /** Every code the loop has committed so far: (vec_id, sub, cluster,
    * dist, batch). The cast pins the partition column back to INT —
    * directory-name inference would otherwise keep it INT anyway, but
    * being explicit protects schema parity with the batch path. */
  def codes(s: SparkSession, codesPath: String): DataFrame =
    s.read.parquet(codesPath)
      .withColumn("sub", col("sub").cast("int"))

  /** Attach the loop to a streaming (vec_id, embedding) frame; the caller
    * picks trigger/checkpoint and starts it. */
  def attach(stream: DataFrame, indexPath: String, codesPath: String,
             m: Int): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexPath, codesPath, m)
    }

  /** Drain the feed and stop (Trigger.AvailableNow) — catch-up mode. */
  def runAvailable(stream: DataFrame, indexPath: String, codesPath: String,
                   checkpoint: String, m: Int): StreamingQuery =
    attach(stream, indexPath, codesPath, m)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
