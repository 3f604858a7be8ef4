package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot grouping keys (BASELINE.json scale
  * directive: "skewed keys -> salting or AQE skew-join").
  *
  * A quarterly key over 100 TB of facts has ~400 distinct values — each
  * group holds billions of rows, so a single-stage groupBy funnels whole
  * quarters through single reducers. Two-phase salted aggregation spreads
  * each hot key over `salts` reducers, then combines the partials.
  *
  * Works for any algebraic aggregate; paired with [[Scalar.stableSum]] the
  * salted result is BIT-IDENTICAL to the unsalted one (exact decimal
  * accumulation is associative), so salting is a pure physical rewrite here
  * — not an approximation.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashes stable row attributes rather
    * than using rand() so replays and retries agree.
    */
  def salt(salts: Int, cols: Column*): Column = pmod(hash(cols: _*), lit(salts))

  /** Two-phase salted sum+count (enough to derive sum/avg/count): phase 1
    * aggregates on (key, salt) — spreading each hot key over `salts`
    * partitions — phase 2 combines partials per key.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, saltSrc: Seq[Column],
                     salts: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("_key"), salt(salts, saltSrc: _*).as("_salt"))
      .agg(sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("_psum"),
        count(value).as("_pcnt"))
    partial.groupBy(col("_key"))
      .agg(sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n"))
      .withColumn("avg_value", col("sum_value") / col("n"))
  }
}
