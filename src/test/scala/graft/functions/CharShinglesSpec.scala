package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The round-12 char-n-gram kernel must be value-identical to the
  * declarative `transform(sequence(...), i -> substring(s, i, n))` +
  * length filter it replaced (q_char_trigrams, q_exact_substr,
  * Media.bovwFeatures) — including the NULL, empty, short-string, and
  * multi-byte-codepoint edges, through BOTH evaluation paths (the
  * Generate consumer runs codegen; the literal-fold path runs eval).
  */
class CharShinglesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dense trigrams equal the declarative substring formulation on the corpus") {
    CharShingles.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), trim(lower(col("text"))).as("nt"))
    val kernel = docs.select(col("doc_id"),
      explode(CharShingles.charShingles(col("nt"), 3)).as("tri"))
    val declarative = docs.select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, greatest(length(nt) - 2, 1)), i -> substring(nt, i, 3))"))
          .as("tri"))
      .filter(length(col("tri")) === 3)
    assert(kernel.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(kernel).isEmpty)
    assert(kernel.count() == declarative.count())
  }

  test("edge cases: null, empty, shorter-than-n, exactly-n, multi-byte") {
    CharShingles.register(spark)
    val rows = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "ab"), (4L, "abc"), (5L, "abcd"),
      (6L, "héllo"), (7L, "日本語です")).toDF("id", "s")
    val got = rows.select(col("id"),
        CharShingles.charShingles(col("s"), 3).as("sh"))
      .orderBy("id").collect().map(r => r.getSeq[String](1).toList)
    assert(got(0) == Nil && got(1) == Nil && got(2) == Nil)
    assert(got(3) == List("abc"))
    assert(got(4) == List("abc", "bcd"))
    assert(got(5) == List("hél", "éll", "llo"))
    assert(got(6) == List("日本語", "本語で", "語です"))
  }

  test("strided form is exact non-overlapping chunking (the bovw patch split)") {
    CharShingles.register(spark)
    val rows = Seq((1L, "a" * 96), (2L, "x" * 32), (3L, "y" * 31))
      .toDF("id", "s")
    val got = rows.select(col("id"),
        size(CharShingles.charShingles(col("s"), 32, 32)).as("n"))
      .orderBy("id").collect().map(_.getInt(1))
    // 96 chars -> 3 full windows; 32 -> 1; 31 -> none (full windows only)
    assert(got.toList == List(3, 1, 0))
    // patches equal the old substring(px, r*32+1, 32) enumeration
    val old = rows.filter(col("id") === 1L).select(
      explode(expr("transform(sequence(0, 2), r -> substring(s, r * 32 + 1, 32))")).as("p"))
    val neu = rows.filter(col("id") === 1L).select(
      explode(CharShingles.charShingles(col("s"), 32, 32)).as("p"))
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
  }

  test("frame mode equals the exploded-substring frameSample formulation") {
    CharShingles.register(spark)
    // the exact pre-r13 Media.frameSample shape: one frame per stride
    // multiple below the length, PARTIAL tails kept, empty payload ->
    // exactly one empty frame (greatest(len,1) dance); multi-byte text
    // exercises the codepoint-offset slicing
    val rows = Seq((1L, ""), (2L, "a" * 5), (3L, "a" * 8), (4L, "a" * 17),
      (5L, "日本語です" * 3)).toDF("id", "s")
    val neu = rows.select(col("id"),
      posexplode(CharShingles.charFrames(col("s"), 4, 8)).as(Seq("i", "f")))
    val old = rows.select(col("id"), col("s"),
        explode(expr(
          "sequence(0, cast(floor((greatest(length(s), 1) - 1) / 8) as int))"))
          .as("i"))
      .select(col("id"), col("i"), expr("substring(s, i * 8 + 1, 4)").as("f"))
    assert(neu.exceptAll(old).isEmpty && old.exceptAll(neu).isEmpty)
    assert(neu.count() == old.count())
    // empty payload: one empty frame; 17 chars at stride 8: frames at
    // 0/8/16, the last 1 char long
    val m = neu.orderBy("id", "i").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toList).toMap
    assert(m(1L) == List(""))
    assert(m(4L).map(_.length) == List(4, 4, 1))
    // null string -> empty array (doc dropped; boundary documented at the
    // frameSample caller, which guarantees non-null text)
    val nul = Seq[(java.lang.Long, String)]((9L, null)).toDF("id", "s")
      .select(size(CharShingles.charFrames(col("s"), 4, 8))).collect()(0).getInt(0)
    assert(nul == 0)
  }

  test("interpreted eval path agrees with codegen (literal input)") {
    CharShingles.register(spark)
    // a foldable argument goes through the expression's eval;
    // the column path above exercises doGenCode
    val lit3 = spark.sql("SELECT char_shingles('abcdef', 3) AS sh")
      .collect()(0).getSeq[String](0).toList
    assert(lit3 == List("abc", "bcd", "cde", "def"))
    val strided = spark.sql("SELECT char_shingles('abcdef', 2, 3) AS sh")
      .collect()(0).getSeq[String](0).toList
    assert(strided == List("ab", "de"))
  }
}
