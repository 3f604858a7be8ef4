package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared shape of the binary vector kernels: both inputs are
  * `array<float>` or `array<double>` (validated at ANALYSIS time — a
  * mis-typed column is an AnalysisException, not runtime garbage from
  * reinterpreting 8-byte slots with `getFloat`), each side is read with
  * its own element width, and products accumulate in double.
  * (Hand-rolled `checkInputDataTypes`: ExpectsInputTypes' TypeCollection
  * is private[sql] in Spark 4.)
  */
private[functions] trait VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def vecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecType(left.dataType) && vecType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Interpreted element read in double precision. */
  protected def get(e: Expression, a: ArrayData, i: Int): Double =
    if (isFloat(e)) a.getFloat(i).toDouble else a.getDouble(i)

  /** Generated-code element read in double precision. */
  protected def getJava(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Cosine similarity over two embedding columns as a native Catalyst
  * expression (SURVEY.md §2.9 X2; preference order (b) — a custom
  * `Expression` beats a UDF, BASELINE.json north-star).
  *
  * Accumulates dot product and both norms in ONE left-to-right double loop:
  *  - codegen'd primitive loop -> stays inside whole-stage codegen, no boxing,
  *    ~100x faster than an interpreted higher-order `aggregate()` chain;
  *  - left-fold double accumulation is bit-identical to DuckDB's
  *    `list_sum(list_transform(list_zip(a,b), p -> CAST(p[1] AS DOUBLE) *
  *    CAST(p[2] AS DOUBLE)))`, verified over all sf0.01 pairs — so
  *    oracle compares need no rounding tolerance.
  *
  * Assumes non-null array elements (embeddings carry none). Interpreted
  * `nullSafeEval` mirrors the generated code exactly.
  */
case class CosineSim(left: Expression, right: Expression) extends VectorKernel {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = get(left, x, i)
      val yi = get(right, y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${getJava(left, a, i)};
         |  double $yi = ${getJava(right, b, i)};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain dot product — the [[CosineSim]] loop without the norms. The
  * sign-LSH bucketing evaluates one dot per hyperplane per row on the
  * banded-dedup hot path; the declarative `aggregate(zip_with(...))`
  * formulation runs its lambdas INTERPRETED (higher-order functions are
  * CodegenFallback), which is exactly the cost this expression removes.
  * Left-to-right accumulation keeps the value bit-identical to DuckDB's
  * list_sum/list_transform fold. Hyperplane literals stay `array<double>`
  * (no float rounding of caller-supplied planes — a near-zero dot must
  * not flip sign against a double-precision oracle).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += get(left, x, i) * get(right, y, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getJava(left, a, i)} * ${getJava(right, b, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All-bands sign-LSH bucketing in ONE looped kernel:
  * `sign_band_buckets(embedding, planes, bands)` returns the
  * `array<int>` of per-band bucket values — bit r of band j is
  * `dot(embedding, planes[j*rowsPerBand + r]) > 0`, packed little-endian
  * exactly like the per-plane `when(dot_product(...) > 0, 1)` column
  * stack it replaces.
  *
  * Why an expression and not 48–128 stacked columns: codegen UNROLLS the
  * stacked form into one straight-line method — 64-element dot loop ×
  * numPlanes — whose bytecode blows past HotSpot's huge-method JIT
  * ceiling, so the generated method runs in the BYTECODE INTERPRETER.
  * Measured on 200k×64f embeddings (one scan + sum, local[32]): 0.56 s
  * at 32 planes → 43.3 s at 48 planes (×77 cliff, then linear: 63 s at
  * 64, 85 s at 88) — silent, because Janino compiles the method fine and
  * nothing logs a fallback. A nested LOOP over a primitive `double[][]`
  * plane matrix held in `references` is a few hundred bytecodes: JIT
  * compiles it, and the whole adaptive-width family (semanticMatches,
  * nearDupPairsBanded, SignBandIndex, hotBuckets) drops the cliff at
  * every corpus size.
  *
  * Value-identical to the stacked form by construction: per-plane dots
  * accumulate left-to-right in double over min(|emb|, |plane|) elements
  * (float elements widened per element), the bit test is strict `> 0`,
  * and a NULL embedding yields the all-zero bucket array (the stacked
  * `when(null > 0, 1).otherwise(0)` collapsed every bit to 0 — same
  * result, and the output stays non-nullable either way).
  *
  * `planes` and `bands` must be foldable (they are literals from
  * [[graft.sim.Similarity.resolvePlanes]]); the plane matrix is
  * extracted once at plan time, never per row.
  */
case class SignBandBuckets(child: Expression, planesExpr: Expression,
                           bandsExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.IntegerType

  override def first: Expression = child
  override def second: Expression = planesExpr
  override def third: Expression = bandsExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val planesOk = planesExpr.foldable && (planesExpr.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    val bandsOk = bandsExpr.foldable && bandsExpr.dataType == IntegerType
    if (embOk && planesOk && bandsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<double>>, " +
        s"foldable int), got ${child.dataType.catalogString}, " +
        s"${planesExpr.dataType.catalogString}, ${bandsExpr.dataType.catalogString}")
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient lazy val planes: Array[Array[Double]] = {
    val arr = planesExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      arr.getArray(i).toDoubleArray())
  }
  @transient lazy val bands: Int = bandsExpr.eval(null).asInstanceOf[Int]
  @transient private lazy val rowsPerBand: Int = planes.length / bands

  private def compute(emb: ArrayData): GenericArrayData = {
    val vals = new Array[Int](bands)
    if (emb != null) {
      var j = 0
      while (j < bands) {
        var v = 0
        var r = 0
        while (r < rowsPerBand) {
          val p = planes(j * rowsPerBand + r)
          val n = math.min(emb.numElements(), p.length)
          var dot = 0.0
          var i = 0
          while (i < n) {
            dot += (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * p(i)
            i += 1
          }
          if (dot > 0) v += (1 << r)
          r += 1
        }
        vals(j) = v
        j += 1
      }
    }
    new GenericArrayData(vals)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val pl = ctx.addReferenceObj("planes", planes, "double[][]")
    val nb = bands
    val rpb = rowsPerBand
    val embCode = child.genCode(ctx)
    val emb = ctx.freshName("emb")
    val vals = ctx.freshName("vals")
    val j = ctx.freshName("j")
    val r = ctx.freshName("r")
    val i = ctx.freshName("i")
    val v = ctx.freshName("v")
    val p = ctx.freshName("p")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val getElem =
      if (isFloat) s"(double) $emb.getFloat($i)" else s"$emb.getDouble($i)"
    val code =
      code"""
         |${embCode.code}
         |int[] $vals = new int[$nb];
         |if (!${embCode.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $emb = ${embCode.value};
         |  for (int $j = 0; $j < $nb; $j++) {
         |    int $v = 0;
         |    for (int $r = 0; $r < $rpb; $r++) {
         |      double[] $p = $pl[$j * $rpb + $r];
         |      int $n = Math.min($emb.numElements(), $p.length);
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $dot += $getElem * $p[$i];
         |      }
         |      if ($dot > 0) $v += (1 << $r);
         |    }
         |    $vals[$j] = $v;
         |  }
         |}
         |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    ev.copy(code = code, isNull =
      org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(child = f, planesExpr = s, bandsExpr = t)
}

object Vectors {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Register SQL-callable vector functions on the session (idempotent).
    * Spark 4 removed public Column-from-Expression construction, so custom
    * expressions surface through the function registry + `expr(...)`.
    */
  private[graft] val cosineBuilder: Seq[Expression] => Expression =
    exprs => CosineSim(exprs(0), exprs(1))
  private[graft] val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs(0), exprs(1))
  private[graft] val signBandBuilder: Seq[Expression] => Expression =
    exprs => SignBandBuckets(exprs(0), exprs(1), exprs(2))

  def register(s: SparkSession): Unit = {
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotBuilder, "built-in")
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_band_buckets", signBandBuilder, "built-in")
  }

  /** Column API for [[CosineSim]]; `a`/`b` are SQL expression strings
    * (column names or expressions) resolved against the calling plan.
    */
  def cosineSim(s: SparkSession, a: String, b: String): Column = {
    register(s)
    expr(s"cosine_sim($a, $b)")
  }
}
