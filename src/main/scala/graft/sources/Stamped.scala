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
  */
object Stamped {
  def ensure(s: SparkSession, dir: String, stampFile: String, name: String)
            (build: => DataFrame): DataFrame = {
    val stamp = new java.io.File(s"$dir/$stampFile").lastModified()
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_${name}_${tag}_$stamp"
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS")))
      build.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }
}
