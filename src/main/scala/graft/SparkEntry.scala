package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Scalar

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, implemented
  * Spark-first on the driver testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the t2 hash-compare. Determinism rules (SURVEY.md §5.1):
  * every query ends in an explicit orderBy on a unique key; float aggregates
  * go through Scalar.stableSum/stableAvg (exact decimal accumulation) so the
  * result is identical regardless of partitioning and matches DuckDB.
  */
object SparkEntry {

  private def p(dir: String, table: String) = s"$dir/$table.parquet"
  private def read(s: SparkSession, dir: String, table: String): DataFrame =
    s.read.parquet(p(dir, table))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qGroupbyAvg(spark, "/root/testdata/sf0.001")

  // --- A1/A2: group-by mean, monthly/daily -> quarterly -------------------
  // Reference: groupby('Quarter').mean() (src/ETL-NPL-Pipeline.py:353,441).
  private def qGroupbyAvg(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .groupBy(Scalar.toQuarter(col("o_orderdate")).as("Quarter"))
      .agg(
        Scalar.stableAvg(col("o_totalprice")).as("avg_price"),
        count(col("o_orderkey")).as("n_orders"))
      .orderBy("Quarter")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_groupby_avg" -> ((s, dir) => qGroupbyAvg(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_groupby_avg" ->
      s"""SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |  ${Scalar.stableAvgSql("o_totalprice")} AS avg_price,
         |  COUNT(o_orderkey) AS n_orders
         |FROM orders GROUP BY 1 ORDER BY Quarter""".stripMargin
  )
}
