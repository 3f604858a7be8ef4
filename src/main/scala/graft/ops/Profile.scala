package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-quality probe every ingestion layer
  * runs before trusting a new drop: per-column null counts, exact distinct
  * cardinalities, and numeric min/max, computed in a SINGLE aggregation
  * over the scan and unpivoted to a tidy (col_name, metric, value) table.
  *
  * Shape for 100 TB: one job, one pass over the data, output bounded by
  * the column count. The multi-column count(distinct) plans as Expand
  * (k-way row multiplication before partial aggregation) — the standard
  * exact formulation, declared here because the cross-engine gate demands
  * value equality; at petabyte row counts swap approx_count_distinct in
  * per column (HLL sketch, no Expand) under the same output contract.
  * Values are emitted as DOUBLE: counts are exact below 2^53 and the
  * numeric extremes are parquet doubles already.
  */
object Profile {

  def profile(df: DataFrame, numericCols: Seq[String],
              otherCols: Seq[String]): DataFrame = {
    require((numericCols ++ otherCols).nonEmpty, "no columns to profile")
    def base(c: String): Seq[(String, Column)] = Seq(
      "n_null" -> sum(when(col(c).isNull, 1L).otherwise(0L)),
      "n_distinct" -> countDistinct(col(c)))
    def extremes(c: String): Seq[(String, Column)] = Seq(
      "min" -> min(col(c)), "max" -> max(col(c)))
    val cells: Seq[(String, String, Column)] =
      numericCols.flatMap(c => (base(c) ++ extremes(c)).map { case (m, e) => (c, m, e) }) ++
        otherCols.flatMap(c => base(c).map { case (m, e) => (c, m, e) })
    val aggs = cells.map { case (c, m, e) => e.cast("double").as(s"${c}__$m") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cells.map { case (c, m, _) =>
        struct(lit(c).as("col_name"), lit(m).as("metric"),
          col(s"${c}__$m").as("value"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name", "metric")
  }
}
