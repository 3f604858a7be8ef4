package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered/stateful fills — the reference's imperative carry-forward loops
  * (pandas `ffill` src/ETL-NPL-Pipeline.py:131; the year fill-down loop
  * :388-404) as window expressions (SURVEY.md §2.7).
  *
  * Scale note: prefer the partitioned form — an un-partitioned window is a
  * single-task sort, acceptable only for ingest-sized data. The reference
  * only ever fills over <200-row frames.
  */
object Ordered {

  /** Forward-fill `c` within `partition`, ordered by `order` — the value of
    * the last non-null preceding row (pandas `ffill`).
    */
  def ffill(c: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val w0 = if (partition.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(partition: _*).orderBy(order: _*)
    last(c, ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** The GDP-sheet fill-down (src/ETL-NPL-Pipeline.py:388-404): rows whose
    * `label` is a 4-char year set the running year; other rows inherit it.
    * Returns the carried-forward year column.
    */
  def carryYear(label: Column, order: Seq[Column]): Column =
    ffill(when(length(label) === 4, label), Seq.empty, order)
}
