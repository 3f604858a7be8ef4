package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse change-management operators: type-2 slowly-changing-dimension
  * assembly and CDC changelog merge (MERGE INTO semantics expressed as
  * declarative joins). Neither exists in the reference (a batch pandas
  * script rebuilds its marts from scratch each run,
  * src/ETL-NPL-Pipeline.py:443-480); both are table stakes for the
  * warehouse this engine feeds at 100 TB, where "rebuild from scratch" is
  * not an option.
  */
object Changes {

  /** Build a type-2 slowly-changing dimension from a change log: one row
    * per (key, version) carrying a half-open validity interval
    * [valid_from, valid_to); the current version has valid_to = null.
    *
    * One window over the change log, partitioned by the business key —
    * a single shuffle on the key at any scale, no self-join (the classic
    * `t1 JOIN t2 ON t1.ts < t2.ts` formulation is quadratic per key).
    * `tieBreak` makes same-timestamp changes deterministic — without it
    * version numbers (and interval bounds) would depend on partitioning.
    */
  def scd2(log: DataFrame, key: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    log
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a CDC changelog to a base table — MERGE INTO semantics as one
    * window + one full-outer join:
    *
    *  - `changes` rows carry (key, seq, op, payload...): op 'U'/'I' upsert
    *    the payload, 'D' deletes the key; `seq` orders multiple changes to
    *    one key and the LATEST op wins (row_number desc — one shuffle on
    *    the key, bounded state per key);
    *  - unchanged base rows pass through; an 'I' on an existing key
    *    behaves as an upsert; a 'D' on an absent key is a no-op.
    *
    * Both inputs shuffle once on the key and the join is co-partitioned —
    * the shape a Delta/Iceberg MERGE compiles to when the changelog is too
    * big to broadcast. `payload` columns must exist in BOTH frames under
    * the same names (null payload on a 'D' is conventional). A 'U' whose
    * payload column is null keeps the base value (coalesce semantics) —
    * partial-column updates work, but an update cannot null out a value.
    * `_op` and `_chg_*` are reserved working names; base columns must not
    * use them.
    *
    * Like [[scd2]], same-`seq` changes to one key are only deterministic
    * with a `tieBreak` column (highest wins after seq): a changelog whose
    * seq is unique per key (the usual CDC log-offset contract) can leave
    * it empty, but if ties are possible, omitting it makes the surviving
    * row partitioning-dependent.
    */
  def cdcMerge(base: DataFrame, changes: DataFrame, key: String, seq: String,
               op: String, payload: Seq[String], tieBreak: String = ""): DataFrame = {
    val order = if (tieBreak.isEmpty) Seq(col(seq).desc)
                else Seq(col(seq).desc, col(tieBreak).desc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val latest = changes
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(key) +: col(op).as("_op") +: payload.map(c => col(c).as(s"_chg_$c")): _*)
    base.join(latest, Seq(key), "full_outer")
      .filter(coalesce(col("_op"), lit("")) =!= "D")
      .select(col(key) +: payload.map(c => coalesce(col(s"_chg_$c"), col(c)).as(c)): _*)
  }
}
