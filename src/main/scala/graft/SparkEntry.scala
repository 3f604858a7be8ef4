package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Marts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, implemented
  * Spark-first on the driver testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the t2 hash-compare. Determinism rules (SURVEY.md §5.1):
  * every query ends in an explicit orderBy on a unique key; float aggregates
  * go through Scalar.stableSum/stableAvg (exact decimal accumulation) so
  * results are identical regardless of partitioning and match DuckDB.
  *
  * The query implementations live in per-family objects under
  * `graft/entry/` (round-5 verdict ask #8 — no file over ~1,300 lines);
  * this object is the stable driver-facing surface that unions them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.martAssembly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the union of
    * the per-family maps under graft/entry/ plus the flagship entry. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
      graft.entry.RelationalQueries.queries ++
      graft.entry.TextSimQueries.queries ++
      graft.entry.AnalyticsQueries.queries ++
      graft.entry.CurationQueries.queries ++
      graft.entry.StatStreamQueries.queries ++
      graft.entry.GraphQualityQueries.queries ++
      graft.entry.MiningQueries.queries ++
      graft.entry.EvalQueries.queries ++
      Map(
        "q_mart_assembly" -> ((s: SparkSession, dir: String) => Marts.martAssembly(s, dir)),
      )

  /** DuckDB equivalents for the t2 hash-compare — union of the
    * per-family oracle maps plus entries for the inline queries. */
  def oracleSql: Map[String, String] =
      graft.entry.RelationalQueries.oracleSql ++
      graft.entry.TextSimQueries.oracleSql ++
      graft.entry.AnalyticsQueries.oracleSql ++
      graft.entry.CurationQueries.oracleSql ++
      graft.entry.StatStreamQueries.oracleSql ++
      graft.entry.GraphQualityQueries.oracleSql ++
      graft.entry.MiningQueries.oracleSql ++
      graft.entry.EvalQueries.oracleSql ++
      Map(
        "q_mart_assembly" -> Marts.martAssemblySql,
      )
}
