package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Upper-triangle Gram matrix Σ x·xᵀ as a native one-pass aggregate
  * (SURVEY.md §4 custom-Catalyst budget): each row's d(d+1)/2 products
  * accumulate into ONE primitive long[] buffer in 1e12 fixed point —
  * `floor(xi*xj*1e12)` per product, exactly the grid the declarative
  * formulation and the DuckDB oracle sum, so results are interchangeable
  * (spec-asserted) while replacing an interpreted nested-transform explode
  * (8M struct allocations at sf0.1) with a primitive double loop.
  *
  * Scale shape: fully partial-aggregable — every partition folds its rows
  * locally and the exchange moves one d(d+1)/2-long buffer per partition,
  * independent of row count. Overflow is CHECKED (Math.addExact): one
  * buffer cell holds ≈ corpus_rows × 1e12 × |x|², so past ~10⁶ rows per
  * entry magnitude callers shard the aggregation or lower the fixed-point
  * scale — a silent wraparound would corrupt the matrix, a thrown
  * ArithmeticException names the limit.
  *
  * Output: array<struct<i:int, j:int, g12:bigint>> (flattened upper
  * triangle), exploded by the caller into (i, j, g12) rows.
  */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("g12", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_agg requires array<float> or array<double>, got ${other.catalogString}")
    }

  // resolved post-analysis; checkInputDataTypes guarantees the match
  private lazy val readsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Buffer layout: [d, cell_0, ..., cell_{d(d+1)/2 - 1}]; d is discovered
    * from the first row (empty buffer = no rows seen yet).
    */
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) {
      val nb = new Array[Long](1 + d * (d + 1) / 2)
      nb(0) = d
      nb
    } else {
      require(buf(0) == d,
        s"gram_agg: vector length $d differs from first-seen length ${buf(0)}")
      buf
    }
    // null elements: the declarative reference multiplies nulls through
    // (null product) and sum() skips them — so a null element contributes
    // to NO cell while the rest of the vector still accumulates. Reading
    // a null slot via getFloat/getDouble would NPE (GenericArrayData) or
    // return garbage (UnsafeArrayData), so guard every read.
    val x = new Array[Double](d)
    val nn = new Array[Boolean](d)
    var i = 0
    while (i < d) {
      nn(i) = !arr.isNullAt(i)
      if (nn(i)) x(i) = if (readsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var k = 1
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        if (nn(i) && nn(j))
          b(k) = Math.addExact(b(k), math.floor(x(i) * x(j) * 1e12).toLong)
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    require(b1(0) == b2(0),
      s"gram_agg: merging buffers of different dims ${b1(0)} vs ${b2(0)}")
    var k = 1
    while (k < b1.length) { b1(k) = Math.addExact(b1(k), b2(k)); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty) return new GenericArrayData(Array.empty[Any])
    val d = buf(0).toInt
    val out = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(Array[Any](i, j, buf(1 + k)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramAgg {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 1)
        throw new IllegalArgumentException(
          s"gram_agg(vec) takes exactly 1 argument, got ${exprs.length}")
      GramAgg(exprs.head).toAggregateExpression()
    }

  /** Register `gram_agg(vec)` for SQL/expr use. */
  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_agg", builder, "built-in")
}
