package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSuite

class HammingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long, Long)], maxH: Int) =
    (for {
      (a, a1, a2) <- rows; (b, b1, b2) <- rows if a < b
      h = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if h <= maxH
    } yield (a, b, h)).toSet

  test("nearPairs equals brute force at every split of <= 3 flips") {
    val base = 0xA5F00F5AL
    // crafted pairs exercising every (half-1 flips, half-2 flips) split:
    // 0+0, 1+0, 0+1, 2+1, 1+2, 3+0, 0+3 (kept) and 2+2, 4+0 (dropped)
    def flip(v: Long, bits: Int*): Long = bits.foldLeft(v)((x, b) => x ^ (1L << b))
    val rows = Seq(
      (0L, base, base),
      (1L, base, base),                          // 0+0
      (2L, flip(base, 3), base),                 // 1+0
      (3L, base, flip(base, 7)),                 // 0+1
      (4L, flip(base, 3, 9), flip(base, 7)),     // 2+1 vs id 0
      (5L, flip(base, 3), flip(base, 7, 11)),    // 1+2 vs id 0
      (6L, flip(base, 1, 2, 4), base),           // 3+0 vs id 0
      (7L, base, flip(base, 1, 2, 4)),           // 0+3 vs id 0
      (8L, flip(base, 20, 21), flip(base, 20, 21)),  // 2+2 vs id 0: dropped
      (9L, flip(base, 5, 6, 8, 10), base),       // 4+0 vs id 0: dropped
      (10L, 0L, 0L), (11L, 1L, 0L))              // zero signatures still pair
    val df = rows.toDF("doc_id", "h1", "h2")
    val got = Hamming.nearPairs(df, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(rows, 3), s"got=${got.size} brute=${brute(rows, 3).size}")
    // sanity on the crafted intent
    assert(got.contains((0L, 1L, 0)) && got.contains((0L, 4L, 3)))
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(0L, 8L) })
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(0L, 9L) })
  }

  test("nearPairs emits each pair exactly once (no cross-half duplicates)") {
    // identical signatures qualify on BOTH halves — the half-0-priority
    // filter must keep exactly one row per pair
    val rows = (0L until 6L).map(i => (i, 0x0F0F0F0FL, 0x33CC33CCL))
    val df = rows.toDF("doc_id", "h1", "h2")
    val got = Hamming.nearPairs(df, "doc_id").collect()
    assert(got.length == 15, s"expected C(6,2)=15 rows, got ${got.length}")
    assert(got.forall(_.getInt(2) == 0))
  }

  test("nearPairs equals brute force on pseudo-random signatures") {
    val rng = new scala.util.Random(7)
    // cluster structure: a few base signatures, many small perturbations —
    // the realistic shape (near-dups exist, most pairs are far)
    val bases = Array.fill(5)(rng.nextLong() & 0xFFFFFFFFL)
    val rows = (0L until 80L).map { i =>
      val b = bases(rng.nextInt(bases.length))
      def jitter(v: Long) = (0 until rng.nextInt(3))
        .foldLeft(v)((x, _) => x ^ (1L << rng.nextInt(32)))
      (i, jitter(b), jitter(b ^ 0x5A5A5A5AL))
    }
    val got = Hamming.nearPairs(rows.toDF("doc_id", "h1", "h2"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = brute(rows, 3)
    assert(got == want, s"got=${got.size} brute=${want.size}")
    assert(want.nonEmpty)
  }

  test("nearPairs refuses maxHamming > 3 (completeness bound)") {
    val df = Seq((1L, 0L, 0L)).toDF("doc_id", "h1", "h2")
    val e = intercept[IllegalArgumentException](
      Hamming.nearPairs(df, "doc_id", maxHamming = 4))
    assert(e.getMessage.contains("complete"))
  }
}
