package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (SURVEY.md §2.9 X3): canonical
  * composition so that visually-identical strings compare, hash, and dedup
  * equal — e.g. "e" + U+0301 COMBINING ACUTE (the decomposed form HTML
  * scrapes and OCR output are full of) becomes the single code point
  * U+00E9. Text normalization is the FIRST pass of every training-data
  * pipeline: exact dedup, shingling, and fingerprinting all key on bytes,
  * and un-normalized text silently splits duplicate groups.
  *
  * Spark has no normalization builtin, and the non-expression routes
  * (UDF / mapPartitions) would break whole-stage codegen on what is by
  * definition a full-corpus scan. This expression stays inside codegen
  * and adds a zero-allocation fast path: an all-ASCII string (the
  * overwhelming majority of a web corpus) is NFC by construction —
  * `UTF8String.isFullAscii` is a vectorized byte scan — so only rows that
  * actually contain multi-byte sequences pay `java.text.Normalizer` (which
  * itself front-runs a quick-check before allocating).
  *
  * Oracle parity: DuckDB ships the same algorithm as `nfc_normalize()`
  * (both implement Unicode UAX #15 canonical composition), so the function
  * is registered under that exact SQL name and every declared query using
  * it is hash-checkable cross-engine.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Shared kernel for interpreted and generated paths (the codegen above
    * calls this static forwarder directly — the loop body is JIT-compiled
    * either way; what matters is staying inside WholeStageCodegen's row
    * pipeline, not inlining the Normalizer).
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s // ASCII is closed under NFC: no alloc, no copy
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  /** Register the SQL-callable `nfc_normalize` (DuckDB's name — the oracle
    * SQL is textually identical on both engines). Idempotent.
    */
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => NfcNormalize(exprs.head)

  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", builder, "built-in")

  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)
}
