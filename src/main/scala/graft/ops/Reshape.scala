package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide<->long reshaping — the reference's most complex operators
  * (pandas `stack`/`pivot`, src/ETL-NPL-Pipeline.py:149-165; SURVEY.md §2.4).
  *
  * Scale notes: `unpivot` is a narrow map-side transform (no shuffle);
  * `pivot` with an explicit value list avoids the extra distinct-collect job
  * Spark otherwise runs to discover pivot columns — at 100 TB that implicit
  * scan would double the cost, so [[pivotLong]] requires the values up front.
  */
object Reshape {

  /** Wide -> long (pandas `stack`, src:149-160). Value columns are cast to a
    * common type by Spark's unpivot; callers align types first.
    */
  def unpivotWide(df: DataFrame, ids: Seq[String], values: Seq[String],
                  varName: String = "metric", valName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)

  /** Long -> wide (pandas `pivot`, src:163-165) with an explicit pivot-value
    * list (no discovery scan) and a caller-chosen aggregate.
    *
    * pandas `pivot` *raises* on duplicate (id, key) pairs while
    * `groupBy.pivot.first` silently picks one (SURVEY.md §7.4.6) — use an
    * associative agg (sum/min/max) unless upstream guarantees uniqueness.
    */
  def pivotLong(df: DataFrame, ids: Seq[String], pivotCol: String,
                pivotValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(ids.map(col): _*).pivot(pivotCol, pivotValues).agg(agg)
}
