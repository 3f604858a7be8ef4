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

  /** Salted inner equi-join for a HOT join key (the join-side counterpart
    * of [[saltedSumCount]]): when the dim side is too big to broadcast and
    * the fact side's key distribution is hot (a handful of key values
    * carry most rows — event types, top domains, boilerplate licences), a
    * plain sort-merge join funnels every hot key through one reducer.
    * Replicate the DIM side `salts` ways (explode on a literal salt
    * array — dim-sized, cheap), give each FACT row a deterministic salt
    * from stable attributes (never rand(): retries and replays must
    * agree), and join on (key, salt): every hot key now spreads over
    * `salts` reducers. A pure physical rewrite — the result set is
    * row-identical to the unsalted join (spec-asserted).
    *
    * AQE's skew-join handles the same problem reactively when post-shuffle
    * partition stats reveal it; the explicit salt is the plan-stable form
    * that does not depend on runtime stat thresholds firing.
    */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame, key: String,
                     saltSrc: Seq[Column], salts: Int = 8): DataFrame = {
    val dimRep = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    facts.withColumn("_salt", salt(salts, saltSrc: _*))
      .hint("merge")
      .join(dimRep, Seq(key, "_salt"))
      .drop("_salt")
  }

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
