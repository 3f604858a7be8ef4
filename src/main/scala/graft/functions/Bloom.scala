package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Explicit bloom-pruned join support: build a bloom filter over a join
  * key set with Spark's own `BloomFilterAggregate` and prune the fact side
  * with `BloomFilterMightContain` BEFORE the join's shuffle — the
  * map-side, scan-adjacent filter that Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for shuffle
  * joins, surfaced as an operator so a pipeline can build the filter ONCE
  * and reuse it across many fact scans (the optimizer re-derives it per
  * query; a curated dim → many facts is the warehouse-common case).
  *
  * Neither expression is registered in Spark's public FunctionRegistry
  * (they are internal to the InjectRuntimeFilter rule), so this wrapper
  * registers them as session temp functions and goes through
  * `call_function` — same pattern as [[Vectors]] (Spark 4 removed public
  * Column-from-Expression construction).
  */
object Bloom {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  private[graft] val aggBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => new BloomFilterAggregate(exprs(0), exprs(1))
  private[graft] val mightContainBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => BloomFilterMightContain(exprs(0), exprs(1))

  /** Register the bloom functions on the session (idempotent). */
  def register(s: SparkSession): Unit = {
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", aggBuilder, "built-in")
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", mightContainBuilder, "built-in")
  }

  /** Serialized bloom filter of `keys`' xxhash64 values. ONE aggregated
    * row reaches the driver — the filter is KBs-to-MBs regardless of how
    * many rows fed it (like the IVF centroids, a bounded-size model, not
    * data), and returning the bytes lets callers embed it as a literal in
    * any number of later scans.
    */
  def buildFilter(keys: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    register(keys.sparkSession)
    val bytes = keys
      .agg(call_function("graft_bloom_agg", xxhash64(col(key)), lit(expectedItems)))
      .head().getAs[Array[Byte]](0)
    // an empty key set aggregates to a null buffer, and lit(null) would
    // only fail analysis three operators later with an opaque type error
    require(bytes != null,
      s"bloom filter over '$key' is null — the key set is empty; " +
        "an empty dim can't prune anything (filter it out before the scan)")
    bytes
  }

  /** Predicate: `key` might be in `filter` (no false negatives; false
    * positives at the aggregate's configured fpp). Evaluates inline in the
    * scan stage — whole-stage codegen'd, zero shuffle.
    */
  def mightContain(s: SparkSession, filter: Array[Byte], key: Column): Column = {
    register(s)
    call_function("graft_might_contain", lit(filter), xxhash64(key))
  }
}
