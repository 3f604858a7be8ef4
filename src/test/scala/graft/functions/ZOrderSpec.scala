package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class ZOrderSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def refZ(a: Long, b: Long): Long = {
    def spread(x: Long): Long =
      (0 until 16).map(k => ((x >> k) & 1L) << (2 * k)).reduce(_ | _)
    spread(a & 0xFFFFL) | (spread(b & 0xFFFFL) << 1)
  }

  test("zorder_key matches the bit-by-bit reference (codegen path)") {
    val rnd = new scala.util.Random(7)
    val input = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = input.toDF("a", "b")
      .select(ZOrder.zOrderKey(spark, col("a"), col("b")).as("z"))
      .as[Long].collect()
    input.zip(got).foreach { case ((a, b), z) =>
      assert(z == refZ(a, b), s"z($a, $b)")
    }
  }

  test("inputs beyond 16 bits are range-reduced, not truncated to garbage") {
    val got = Seq((65536L + 5L, 3L)).toDF("a", "b")
      .select(ZOrder.zOrderKey(spark, col("a"), col("b")).as("z"))
      .as[Long].head()
    assert(got == refZ(5L, 3L)) // pmod 65536
  }

  test("locality: contiguous z-key runs cover square tiles, not slabs") {
    // All 4096 points of a 64x64 grid, sorted by z-key and chunked into
    // 16 equal runs ("files"): each run's bounding box must be the 16x16
    // tile the curve guarantees (area 256), not the 4x64 slab a
    // single-column sort would give. This is exactly the parquet
    // row-group min/max tightness that makes EITHER dimension's filter
    // prune the scan.
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val keyed = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zOrderKey(spark, col("x"), col("y")).as("z"))
      .orderBy("z").as[(Long, Long, Long)].collect()
    keyed.grouped(256).foreach { chunk =>
      val (xs, ys) = (chunk.map(_._1), chunk.map(_._2))
      val area = (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      assert(area == 256, s"chunk bbox area $area, expected 256 (16x16 tile)")
    }
  }
}
