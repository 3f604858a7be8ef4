package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-or-read stamped parquet artifacts: the repo's materialize-once
  * convention for expensive immutable derivations (edge lists, neighbor
  * tables, band/centroid indexes). The path is keyed by the mtime of the
  * source table the derivation reads (the driver rewrites a whole SF dir
  * together, so one file's stamp stands for the snapshot), the build is
  * `_SUCCESS`-guarded so a crashed write re-runs, and reads after the
  * first call cost one parquet scan — at 100 TB this is the difference
  * between one corpus pass per snapshot and one per query.
  *
  * Policy — what gets stamped: a derivation is materialized here ONLY
  * when two or more queries consume the identical table (the purchase
  * graph, co-purchase pairs, near-dup pairs/groups, exact-Jaccard truth,
  * kNN/retrieval-eval tables). Single-consumer operator demonstrations
  * (q_ngram_jaccard, q_minhash_lsh, q_jaccard_prefix, the PQ/IVF
  * training chains) stay LIVE so the bench keeps measuring the operator,
  * not a parquet read — over-stamping would turn the suite into a scan
  * benchmark and hide plan regressions.
  *
  * Concurrency: the build writes to a private staging directory and
  * PUBLISHES with one atomic rename (the HDFS/local-FS commit idiom), so
  * a concurrent reader can never observe a half-written artifact — it
  * either sees the previous complete state (absent → rebuild in its own
  * staging dir) or the complete new one. If two builders race, the
  * rename loser simply discards its staging copy; both built the same
  * deterministic content.
  */
object Stamped {
  def ensure(s: SparkSession, dir: String, stampFile: String, name: String)
            (build: => DataFrame): DataFrame = {
    val stamp = new java.io.File(s"$dir/$stampFile").lastModified()
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_${name}_${tag}_$stamp"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      val staging = new org.apache.hadoop.fs.Path(
        path + ".staging_" + java.util.UUID.randomUUID().toString.take(8))
      build.write.mode("overwrite").parquet(staging.toString)
      // a leftover dir without _SUCCESS is a crashed write: clear it so
      // the rename can land (rename into an existing dir would nest)
      if (fs.exists(root) &&
          !fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS")))
        fs.delete(root, true)
      if (!fs.rename(staging, root)) {
        // lost a publish race — the winner's artifact is complete and
        // identical (deterministic build); drop the staging copy
        fs.delete(staging, true)
      }
    }
    s.read.parquet(path)
  }
}
