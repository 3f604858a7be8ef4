package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (BASELINE.json scale
  * directive: "co-locate joins via bucketing or pre-partitioning").
  *
  * Writing both fact tables bucketed+sorted on the join key means a later
  * join reads bucket i against bucket i directly — NO shuffle exchange at
  * query time. On a 100 TB fact-to-fact join the exchange is the dominant
  * cost; bucketing moves it one-time into the write.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keyCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent [[writeBucketed]]: the one-time write is ONE-time — if the
    * session already has the table it is reused as-is, and if only the
    * files survive (a previous session wrote them; the in-memory catalog
    * died with it) the table is re-registered over the existing layout
    * with the same bucket spec instead of being rewritten. Re-running a
    * bucketed-join query therefore pays the join, not the table build —
    * on a 100 TB fact table the rewrite would dwarf the join it enables.
    */
  def ensureBucketed(s: SparkSession, df: => DataFrame, table: String,
                     path: String, buckets: Int, keyCol: String): Unit = {
    if (s.catalog.tableExists(table)) return
    // Only trust surviving files when the writer's job COMMITTED (_SUCCESS
    // marker): a directory left by a crashed write holds a partial bucket
    // set, and registering it would return silently short join results.
    if (new java.io.File(path, "_SUCCESS").exists()) {
      val schema = df.schema.toDDL
      s.sql(s"CREATE TABLE $table ($schema) USING parquet " +
        s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    } else writeBucketed(df, table, path, buckets, keyCol)
  }

  def readTable(s: SparkSession, table: String): DataFrame = s.table(table)
}
