package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
  * Bit-compatible with the declarative reference and with DuckDB's
  * `list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2],
  * ' '))` (property-tested in EngineProps).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val m = tk.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tk.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tk => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val sepTerm = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      s"""
         |int $m = $tk.numElements() - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String[] $parts =
         |      new org.apache.spark.unsafe.types.UTF8String[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $tk.getUTF8String($i + $j);
         |    }
         |    $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sepTerm, $parts);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Register the SQL-callable `word_shingles(tokens, n)` (n must be a
    * literal) on the session — idempotent.
    */
  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")

  /** Column form; call [[register]] on the session first. */
  def wordShingles(tk: Column, n: Int): Column =
    call_function("word_shingles", tk, lit(n))
}
