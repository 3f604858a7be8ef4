package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash sketch as a native aggregate (SURVEY.md §4: the reserved
  * custom-Catalyst budget): one pass over the exploded shingle column
  * computes all `numHashes` salted-xxhash64 minima in a single primitive
  * long[] buffer.
  *
  * Versus `numHashes` separate `min(xxhash64(lit(i), s))` aggregate columns
  * this is one aggregate evaluation per row instead of 32, one buffer
  * instead of 32, and the merge is an element-wise min — fully partial-
  * aggregable, so map-side combine still applies on a 100 TB corpus.
  *
  * Hash identity: seed chain xxhash64(i) then the UTF-8 bytes — exactly
  * what `xxhash64(lit(i), s)` computes, so signatures are interchangeable
  * with the column-wise formulation (spec-asserted).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        // identical to xxhash64(lit(i), s): fold the INT salt (lit(i) is
        // IntegerType — int and long hash differently), then the string
        val seeded = XxHash64Function.hash(i, IntegerType, 42L)
        val h = XxHash64Function.hash(s, StringType, seeded)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  /** Register `minhash_agg(shingle, numHashes)` for SQL/expr use.
    * `numHashes` must be a positive integer literal — checked here at
    * analysis time so a bad call fails with a signature error, not a
    * ClassCastException out of the registry builder.
    */
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"minhash_agg(shingle, numHashes) takes exactly 2 arguments, got ${exprs.length}")
      val nExpr = exprs(1)
      val integral = nExpr.dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      if (!nExpr.foldable || !integral)
        throw new IllegalArgumentException(
          s"minhash_agg: numHashes must be an integer literal, got ${nExpr.sql}")
      val v = nExpr.eval(null)
      if (v == null || v.asInstanceOf[Number].intValue() < 1)
        throw new IllegalArgumentException(
          s"minhash_agg: numHashes must be a positive integer, got $v")
      MinHashAgg(exprs.head, v.asInstanceOf[Number].intValue()).toAggregateExpression()
    }

  def register(s: SparkSession): Unit =
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg", builder, "built-in")
}
