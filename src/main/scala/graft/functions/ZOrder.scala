package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit, pmod}
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit Morton (Z-order) key: interleaves the low 16 bits of two
  * non-negative longs — bit k of `left` lands at position 2k, bit k of
  * `right` at 2k+1. Sorting/range-partitioning a table by this key gives
  * multi-dimensional data locality, so BOTH dimensions' parquet min/max
  * row-group stats stay tight and either predicate prunes the scan — the
  * standard layout trick for two-dimensional filter workloads at 100 TB
  * (a single-column sort gives perfect pruning on one dimension and none
  * on the other).
  *
  * Codegen is the classic mask-spread (4 shift/mask rounds per side, no
  * loop); inputs beyond 16 bits must be range-reduced by the caller
  * (`zOrderKey` applies pmod 65536) — silently masking here would make
  * equal keys from unequal inputs without the caller opting in.
  *
  * For BALANCED pruning, scale both dimensions onto comparable bit
  * widths first (rank- or min/max-normalize to 0..65535): interleaving
  * an 8-bit key against a 14-bit key raw puts every high splitting bit
  * in the wide dimension's half and prunes nothing on the narrow one —
  * production z-order layouts normalize for exactly this reason
  * (ZOrderSpec demonstrates both the failure and the fix).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  @inline private def spread(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val va = ctx.freshName("za")
      val vb = ctx.freshName("zb")
      def spreadJava(v: String, in: String): String =
        s"""long $v = $in & 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |${spreadJava(va, a)}
         |${spreadJava(vb, b)}
         |${ev.value} = $va | ($vb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrder {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  private[graft] val builder: Seq[Expression] => Expression =
    exprs => ZOrderKey(exprs(0), exprs(1))

  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", builder, "built-in")

  /** Z-order key of two dimension columns, range-reduced to 16 bits each
    * (pmod keeps negative inputs in range too).
    */
  def zOrderKey(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    call_function("zorder_key",
      pmod(a.cast("long"), lit(65536L)), pmod(b.cast("long"), lit(65536L)))
  }

  /** DuckDB spelling of the same key (16 explicit bit terms per side) for
    * oracle parity; `a`/`b` are SQL expressions already reduced mod 65536.
    */
  def zOrderKeySql(a: String, b: String): String = {
    val terms = (0 until 16).flatMap { k =>
      Seq(s"(((($a) >> $k) & 1) << ${2 * k})", s"(((($b) >> $k) & 1) << ${2 * k + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
