package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd portable string hash — the hot-path form of
  * `TextOps.portableHash` (base-31 polynomial over Unicode code points,
  * mod 2^31-1).
  *
  * The declarative formulation (`aggregate(transform(split(c,''), ...))`)
  * allocates a per-row array of single-char strings and evaluates the
  * lambdas interpreted (higher-order functions are CodegenFallback) — per
  * token, on every token of a 100 TB corpus. This expression is one
  * primitive loop inside whole-stage codegen: no splitting, no boxing.
  *
  * Iterates CODE POINTS, which is exactly DuckDB's `ord()` per
  * `string_split(s,'')` element, so oracle parity holds for all of
  * Unicode (the split-based Spark formulation would diverge on
  * supplementary-plane characters, where Java regex splits between
  * surrogate halves).
  */
case class PortableHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // registered session-wide as SQL `portable_hash`: declare the input type
  // so a non-string argument is coerced (or rejected) at ANALYSIS time
  // instead of failing codegen with a ClassCastException. (Return type
  // inferred: AbstractDataType is private[sql] in Spark 4.)
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length();) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31 + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHash {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Analysis-time builder, shared by [[register]] and the
    * [[graft.plans.GraftExtensions]] cluster-wide injection.
    */
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => PortableHash(exprs.head)

  /** Register the SQL-callable `portable_hash` on the session (idempotent;
    * Spark 4 surfaces custom expressions through the function registry).
    */
  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash", builder, "built-in")

  /** Column form — usable anywhere, including inside higher-order-function
    * lambdas (`call_function` resolves against the registry at analysis).
    * Call [[register]] on the session first.
    */
  def portableHash(c: Column): Column = call_function("portable_hash", c)
}
