package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling over a token array — the hot-path form
  * of `TextOps.shingles` (space-joined runs of n consecutive tokens;
  * fewer than n tokens yields an empty array).
  *
  * The declarative formulation (`transform(sequence(...), i =>
  * array_join(slice(tk, i, n), " "))`) evaluates its lambdas INTERPRETED
  * (higher-order functions are CodegenFallback) and allocates a sliced
  * array per shingle. Shingling runs once per document on EVERY text
  * dedup path (n-gram Jaccard, MinHash+LSH signatures and verification),
  * so on a 100 TB corpus it is the dominant scan cost — this expression
  * is one primitive loop inside whole-stage codegen, one UTF8String
  * concat per shingle, no boxing.
  *
  * Bit-compatible with the declarative reference — INCLUDING null input,
  * where `TextOps.shingles` yields `[]` (its `when(size(tk) >= n, ...)`
  * falls through to the empty-array branch because `size(NULL)` is NULL),
  * so this expression is never-null too — and with DuckDB's
  * `list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2],
  * ' '))` (property-tested in EngineProps, null rows included).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // hand-rolled (ExpectsInputTypes' AbstractDataType is private[sql]):
  // a non-array<string> argument is an analysis error, not a runtime CCE
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.catalogString}")
  }

  override def nullable: Boolean = false

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else {
      val tk = v.asInstanceOf[ArrayData]
      val m = tk.numElements() - n + 1
      if (m <= 0) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](m)
        // one scratch buffer per ROW, overwritten per shingle (concatWs
        // copies what it needs) — not one allocation per shingle
        val parts = new Array[UTF8String](n)
        var i = 0
        while (i < m) {
          var j = 0
          while (j < n) { parts(j) = tk.getUTF8String(i + j); j += 1 }
          out(i) = UTF8String.concatWs(sep, parts: _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val tk = childGen.value
    val m = ctx.freshName("m")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val out = ctx.freshName("out")
    val parts = ctx.freshName("parts")
    val sepTerm = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    val gad = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (${childGen.isNull}) {
        ${ev.value} = new $gad(new Object[0]);
      } else {
        int $m = $tk.numElements() - $n + 1;
        if ($m <= 0) {
          ${ev.value} = new $gad(new Object[0]);
        } else {
          Object[] $out = new Object[$m];
          $utf8[] $parts = new $utf8[$n];
          for (int $i = 0; $i < $m; $i++) {
            for (int $j = 0; $j < $n; $j++) {
              $parts[$j] = $tk.getUTF8String($i + $j);
            }
            $out[$i] = $utf8.concatWs($sepTerm, $parts);
          }
          ${ev.value} = new $gad($out);
        }
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Register the SQL-callable `word_shingles(tokens, n)` on the session
    * (idempotent). `n` must be a positive integer literal — checked HERE,
    * at analysis time, so a bad call is a clear function-signature error
    * rather than a ClassCastException out of the registry builder.
    */
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"word_shingles(tokens, n) takes exactly 2 arguments, got ${exprs.length}")
      val nExpr = exprs(1)
      val integral = nExpr.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!nExpr.foldable || !integral)
        throw new IllegalArgumentException(
          s"word_shingles: n must be an integer literal, got ${nExpr.sql}")
      val v = nExpr.eval(null)
      if (v == null)
        throw new IllegalArgumentException("word_shingles: n must not be NULL")
      WordShingles(exprs.head, v.asInstanceOf[Number].intValue())
    }

  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", builder, "built-in")

  /** Column form; call [[register]] on the session first. */
  def wordShingles(tk: Column, n: Int): Column =
    call_function("word_shingles", tk, lit(n))
}
