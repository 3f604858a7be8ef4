package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory for the graft engine.
  *
  * The driver mains (Verify/Bench) build their own sessions per the harness
  * contract; this is the entry point for library users and encodes the
  * configs the engine is designed around:
  *
  *  - AQE on: runtime broadcast conversion, skew-join splitting, partition
  *    coalescing — the mart-assembly join DAG relies on it to pick
  *    broadcast vs shuffle per series at any scale.
  *  - shuffle.partitions sized to the cluster, not the 200 default: pass
  *    ~2-3x total executor cores; AQE coalesces down from there.
  *  - UTC session timezone: quarter keys must not shift across clusters.
  *  - 128 MiB file split size: parquet scan parallelism at TB scale without
  *    drowning the scheduler in tiny tasks.
  */
object GraftSession {

  def builder(appName: String = "graft", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // TIMESTAMP(NANOS) parquet columns surface as nanos longs instead of
      // failing the scan; graft.sources.Tables.events rebuilds them. Set
      // here once — not as a read-path side effect (ADVICE r1).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // generous codegen-class cache: a long-lived session running many
      // distinct queries thrashes the default 100-entry LRU
      .config("spark.sql.codegen.cache.maxEntries", "2000")

  /** Local session for tests/exploration. */
  def local(cores: Int = 4): SparkSession =
    builder(shufflePartitions = cores).master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
