package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar column functions re-expressing the reference's row-wise cleaning
  * helpers (src/ETL-NPL-Pipeline.py:63-67,134,169-176,344-350,385,432-438)
  * as pure Catalyst expressions — zero `udf()` so whole-stage codegen and
  * pushdown survive (SURVEY.md §2.6/§2.8).
  */
object Scalar {

  /** "Q2/2025" -> "2025-Q2" (reference `reformat_quarter`,
    * src/ETL-NPL-Pipeline.py:63-67). Pure regex, no UDF.
    */
  def quarterSwap(c: Column): Column =
    regexp_replace(c, "^Q(\\d)/(\\d{4})$", "$2-Q$1")

  /** Strip trailing revision markers `p`/`r`/`p1`/`r1` plus surrounding
    * whitespace (src/ETL-NPL-Pipeline.py:134,385).
    */
  def stripRevision(c: Column): Column =
    trim(regexp_replace(c, "\\s*(r1|p1|r|p)$", ""))

  /** "106,371" -> 106371L (src/ETL-NPL-Pipeline.py:173). */
  def deComma(c: Column): Column =
    regexp_replace(c, ",", "").cast("long")

  /** Percent string/number -> ratio double (/100) (src:169,245,347,380,435). */
  def pctToRatio(c: Column): Column =
    c.cast("double") / lit(100.0)

  /** Timestamp/date -> "YYYY-Qx" quarter key — the reference's universal
    * join key (src/ETL-NPL-Pipeline.py:350,438). String sort == chronological
    * sort for this zero-padded format (SURVEY.md §7.4.3).
    */
  def toQuarter(c: Column): Column =
    concat(year(c).cast("string"), lit("-Q"), quarter(c).cast("string"))

  // --- Deterministic aggregates -------------------------------------------
  // Double summation is order-dependent; at 1000-executor scale partial-agg
  // arrival order is nondeterministic. Summing in exact DECIMAL arithmetic
  // makes the aggregate bit-stable regardless of partitioning AND lets the
  // DuckDB oracle reproduce it exactly. One final double conversion.

  private val SumScale = DecimalType(18, 6)

  /** Order-independent sum of a double column: exact decimal accumulation,
    * one final cast back to double.
    */
  def stableSum(c: Column): Column =
    sum(c.cast(SumScale)).cast("double")

  /** Order-independent mean: exact decimal sum / non-null count. */
  def stableAvg(c: Column): Column =
    stableSum(c) / count(c)

  /** DuckDB-side rendering of the same aggregates, for oracle SQL parity.
    *
    * The double exit goes through an exact VARCHAR roundtrip: DuckDB's
    * direct decimal→DOUBLE cast double-rounds (scaled int → double, then
    * a multiply by 1e-scale — e.g. DECIMAL(18,6) 9999999999.999999 comes
    * out 1e10, one ULP above the correctly-rounded 9999999999.999998),
    * while Spark's Decimal.toDouble (BigDecimal.doubleValue) is
    * correctly rounded. Decimal→VARCHAR is exact in both engines and
    * VARCHAR→DOUBLE is correctly rounded in both (fast_float /
    * Double.parseDouble), so the roundtrip forces DuckDB onto the
    * correctly-rounded value Spark already produces — engine-identical
    * at ANY decimal width and magnitude, closing the whole
    * decimal→double last-ULP drift class (round-8's q_sql_disc_revenue
    * pathology) instead of auditing magnitudes site by site.
    */
  def stableSumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS VARCHAR(64)) AS DOUBLE)"
  def stableAvgSql(expr: String): String =
    s"(${stableSumSql(expr)} / COUNT($expr))"

  /** Order-independent sum of products (second moments for covariance /
    * correlation / stddev): DECIMAL(18,6)×DECIMAL(18,6) → exact
    * DECIMAL(37,12) products, exact decimal sum, one double conversion.
    * corr/stddev derived from these moments in plain double arithmetic are
    * bit-stable across partitionings AND engines — unlike the built-in
    * corr()/stddev(), whose double accumulators are combine-order-dependent.
    */
  def stableSumProd(x: Column, y: Column): Column =
    sum(x.cast(SumScale) * y.cast(SumScale)).cast("double")

  /** DuckDB side: DECIMAL(19,6) operands, NOT 18 — DuckDB multiplies at
    * the operands' width (an 18×18 product overflows its INT64 backing)
    * and only widths ≥ 19 promote the product to the HUGEINT-backed
    * DECIMAL(38,12). Both engines' products are exact, so the extra digit
    * changes nothing about the values.
    */
  def stableSumProdSql(x: String, y: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(19,6)) * CAST($y AS DECIMAL(19,6))) AS VARCHAR(64)) AS DOUBLE)"
}
