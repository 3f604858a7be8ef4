package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline health metrics via Spark's Observation API:
  * attach named aggregates to a frame and read them AFTER the action
  * completes — no second scan. At 100 TB a separate profiling query
  * doubles the IO bill; `observe()` piggybacks the metrics on the job
  * that is already running, accumulated map-side like any aggregate.
  *
  * The canonical use is a load-bearing ingestion invariant ("how many
  * rows did the filter drop, how many nulls passed through") checked on
  * the SAME pass that produced the output — see ObservedSpec for the
  * wiring.
  */
object Observed {

  /** Attach row-count and per-column null-count metrics to `df`. Returns
    * the observed frame (use it IN PLACE of `df` downstream) plus the
    * handle; `handle.get` blocks until the first action over the frame
    * completes and then yields the metrics row as a Map.
    */
  def withHealthMetrics(df: DataFrame, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
