package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-training-data pipeline surface
  * (BASELINE.json north-star; SURVEY.md §2.9 X3) — all pure Catalyst
  * expressions, codegen-friendly, DuckDB-reproducible.
  */
object TextOps {

  /** Whitespace tokenization after lowercase+trim — matches DuckDB
    * `string_split_regex(trim(lower(text)), '\s+')` exactly.
    */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Adjacent token pairs of a text column as array<struct<w1, w2>> —
    * built IN-ROW (zip_with of the token array with its own tail; no
    * positional self-join), empty-safe via the greatest() guard (a
    * sub-2-token doc yields an empty array, not a negative slice length).
    * The one definition both bigram consumers (LM surprisal, PMI
    * collocations) explode.
    */
  def bigramPairs(c: Column): Column = {
    val tk = tokens(c)
    val n1 = greatest(size(tk) - 1, lit(0))
    zip_with(slice(tk, lit(1), n1), slice(tk, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Word n-gram shingles over a token array. Guarded: fewer than n tokens
    * yields an empty array (Spark `sequence(1, 0)` would count DOWN).
    */
  def shingles(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** BPE-ish regex tokenization (letter runs / digit runs / single
    * punctuation) — the pre-tokenizer shape BPE vocabularies train over.
    * Same RE2-compatible pattern evaluates identically in DuckDB's
    * regexp_extract_all.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(BpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Order-sensitive polynomial rolling hash over the token sequence:
    * h' = (h*31 + xxhash64(token) mod M) mod M with M = 2^31-1 — a
    * document-level content fingerprint that distinguishes permutations,
    * unlike set-based fingerprints. Modular form keeps every intermediate
    * below 2^36 (Spark 4 runs ANSI mode: Long overflow THROWS, it does not
    * wrap). Engine-specific hash; [[portableRollingHash]] is the
    * cross-engine-checkable variant.
    */
  def rollingHash(tk: Column): Column = {
    val m = lit(2147483647L) // 2^31 - 1
    aggregate(transform(tk, t => pmod(xxhash64(t), m)), lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, m))
  }

  // --- portable (cross-engine) hash family -----------------------------
  //
  // xxhash64 is Spark-specific, so anything built on it can only be
  // rows-only-checked. The family below uses ONLY integer ops both Spark
  // and DuckDB evaluate identically (fold, *, %, xor, >>), staying in
  // [0, 2^31) so no intermediate exceeds 2^62 (ANSI-safe, BIGINT-safe):
  // DuckDB equivalents are spelled out in SparkEntry.oracleSql.

  /** Modulus of the portable hash family: 2^31 - 1 (prime). */
  val HashMod = 2147483647L

  /** Default diffusion multiplier. Every site that regenerates the family
    * (Column ops here, driver-side Similarity.portablePlanes, the DuckDB
    * SQL in SparkEntry) must reference THESE constants — a divergent copy
    * silently breaks oracle parity.
    */
  val DefaultMixMult = 2246822519L

  /** Second family member (the independent simhash half). */
  val AltMixMult = 2654435761L

  /** Base-31 polynomial over code points, mod 2^31-1. DuckDB:
    * list_reduce(list_prepend(0, list_transform(string_split(w,''),
    * c -> greatest(ord(c),0))), (acc,x) -> (acc*31+x) % M) — the
    * greatest() guard aligns ord('') = -1 with Spark's ascii('') = 0.
    */
  def portableHash(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => pmod(acc * lit(31L) + x, lit(HashMod)))

  /** One diffusion round: xor-shift then modular multiply. The raw
    * polynomial's low bits are badly distributed (a plain base-31 fold is
    * nearly linear in the last characters); two rounds give the avalanche
    * the banding schemes below need. h stays in [0, 2^31); h*mult < 2^62.
    */
  def mixRound(h: Column, mult: Long): Column =
    pmod(h.bitwiseXOR(shiftright(h, 16)) * lit(mult), lit(HashMod))

  /** Two mix rounds over an already-computed hash column. */
  def mixedOf(h: Column, mult: Long = DefaultMixMult): Column =
    mixRound(mixRound(h, mult), mult)

  /** Two-round mixed portable hash; `mult` picks an independent family
    * member (defaults differ between e.g. the two simhash halves). This is
    * the registration-free REFERENCE formulation; hot paths use the
    * codegen'd [[graft.functions.TextHash.portableHash]] under [[mixedOf]]
    * instead (same values — asserted in TextHashSpec).
    */
  def mixedHash(c: Column, mult: Long = DefaultMixMult): Column =
    mixedOf(portableHash(c), mult)

  /** [[rollingHash]] with the portable per-token hash — bit-identical in
    * DuckDB, so the fingerprint query gets a real oracle. Prime base
    * 1000003; acc < 2^31, so acc*1000003 + h < 2^52 (ANSI-safe).
    */
  def portableRollingHash(tk: Column): Column =
    aggregate(transform(tk, t => portableHash(t)), lit(0L),
      (acc, h) => pmod(acc * lit(1000003L) + h, lit(HashMod)))

  /** [[portableRollingHash]] with the codegen'd per-token hash (the char
    * split/transform/aggregate chain is the expensive part). Requires
    * `TextHash.register(session)`.
    */
  def portableRollingHashFast(tk: Column): Column =
    aggregate(transform(tk, t => graft.functions.TextHash.portableHash(t)), lit(0L),
      (acc, h) => pmod(acc * lit(1000003L) + h, lit(HashMod)))

  /** English stopword lexicon for the language-ID heuristic. */
  val EnStopwords: Seq[String] =
    Seq("a", "an", "the", "of", "to", "in", "and", "is", "it", "for", "on", "with")

  /** Content fingerprint: md5 of language-tagged normalized text
    * (X3 document fingerprinting; md5 is hex-identical across engines).
    */
  def fingerprint(lang: Column, text: Column): Column =
    md5(concat_ws("|", lang, trim(lower(text))))

  /** Share of characters that are lowercase letters or spaces after
    * normalization — a punctuation/noise quality signal.
    */
  def alphaRatio(c: Column): Column = {
    val norm = trim(lower(c))
    length(regexp_replace(norm, "[^a-z ]", "")).cast("double") / length(norm)
  }

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(c: Column): Column = {
    val tk = tokens(c)
    size(array_distinct(tk)).cast("double") / size(tk)
  }

  /** Composite quality score — fixed operation order so the double result
    * is bit-identical to the oracle's identical formula.
    */
  def qualityScore(c: Column): Column =
    lit(0.5) * typeTokenRatio(c) + lit(0.5) * alphaRatio(c)

  // --- PII redaction ---------------------------------------------------
  //
  // RE2-compatible patterns (no lookaround, no backrefs) so Spark's Java
  // regex and DuckDB's RE2 match identically — the same dialect-portability
  // rule as BpePattern. Redaction is regexp_replace (codegen'd, map-only:
  // at 100 TB this is a pure scan with zero shuffle).

  /** Email address (simplified RFC shape, lowercase corpus). */
  val PiiEmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** US-style short phone fragment NNN-NNNN. */
  val PiiPhonePattern = "[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 literal. */
  val PiiIpPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Replace every email/phone/IP occurrence with a typed placeholder.
    * Order matters and is part of the contract (emails first — their local
    * parts may embed digit runs that the narrower patterns would clip):
    * any oracle must apply the same three passes in the same order.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, PiiEmailPattern, "<EMAIL>"),
        PiiPhonePattern, "<PHONE>"),
      PiiIpPattern, "<IP>")
}
