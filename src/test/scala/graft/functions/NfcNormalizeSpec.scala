package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** All non-ASCII content is spelled as \ u escapes: a raw combining mark in
  * source could be silently re-composed by an editor and invert the test.
  */
class NfcNormalizeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val decomposed = "a\u0301" // 'a' + COMBINING ACUTE
  private val composed = "\u00E1"   // precomposed form

  test("composes decomposed sequences to canonical form") {
    NfcNormalize.register(spark)
    val r = Seq(decomposed, s"caf${decomposed}te", "plain ascii")
      .toDF("s")
      .select(NfcNormalize.nfcNormalize($"s").as("n"), length($"s").as("lr"),
        length(NfcNormalize.nfcNormalize($"s")).as("ln"))
      .as[(String, Int, Int)].collect()
    assert(r(0)._1 == composed && r(0)._2 == 2 && r(0)._3 == 1)
    assert(r(1)._1 == s"caf${composed}te" && r(1)._2 == 7 && r(1)._3 == 6)
    assert(r(2)._1 == "plain ascii" && r(2)._2 == r(2)._3)
  }

  test("ASCII fast path returns the input object, no copy") {
    val s = UTF8String.fromString("pure ascii text")
    assert(NfcNormalize.nfc(s) eq s)
    // already-NFC non-ASCII also avoids the re-encode
    val t = UTF8String.fromString(s"d${composed}j\u00E0 vu")
    assert(NfcNormalize.nfc(t) eq t)
  }

  test("null-safe and analysis-time typed via the SQL registration") {
    NfcNormalize.register(spark)
    val r = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))").collect()
    assert(r.head.isNullAt(0))
    // non-string input coerces at analysis instead of failing codegen
    val n = spark.sql("SELECT nfc_normalize(123)").as[String].head()
    assert(n == "123")
  }

  test("interpreted eval agrees with codegen on mixed content") {
    NfcNormalize.register(spark)
    val data = Seq("e\u0301", "o\u0308o\u0308", "mixed a\u0300 end", "", s"nfc $composed")
    val viaDf = data.toDF("s")
      .select(NfcNormalize.nfcNormalize($"s")).as[String].collect().toSeq
    val viaEval = data.map(s =>
      NfcNormalize.nfc(UTF8String.fromString(s)).toString)
    assert(viaDf == viaEval)
    // NFC is idempotent
    assert(viaEval.map(s => NfcNormalize.nfc(UTF8String.fromString(s)).toString) == viaEval)
  }
}
