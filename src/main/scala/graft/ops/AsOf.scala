package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark lacks as a
  * primitive. Composed from built-ins per the extension preference order
  * (compose > custom Expression > custom plan): tag and union both sides,
  * one keyed window pass carries the latest right-side values forward, then
  * keep left rows.
  *
  * Cost: ONE shuffle (the window partitioning) regardless of right-side
  * cardinality — no range-join row explosion, no per-row binary search.
  * Scale: parallelism = number of keys; a keyless as-of needs time-range
  * partitioning instead and is intentionally not offered here.
  *
  * Tie semantics: a right row at exactly the left row's time IS matched
  * (>= semantics, like DuckDB's ASOF JOIN); among right rows with the same
  * (key, time) the last under `tieBreak` wins — pass one for determinism.
  */
object AsOf {

  def joinLastBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                     timeCol: String, valueCols: Seq[String],
                     tieBreak: Option[Column] = None): DataFrame = {
    val l = left.withColumn("_isr", lit(0))
    val r = right.select(
      (keys.map(col) :+ col(timeCol) :+ lit(1).as("_isr")) ++ valueCols.map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal time (desc _isr) => a right
    // row at the same instant is visible to that left row
    val order = Seq(col(timeCol).asc, col("_isr").desc) ++ tieBreak.map(_.asc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("_isr") === 0).drop("_isr")
  }
}
