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
    * wrap). Engine-specific hash ⇒ rows-only (no SQL oracle).
    */
  def rollingHash(tk: Column): Column = {
    val m = lit(2147483647L) // 2^31 - 1
    aggregate(transform(tk, t => pmod(xxhash64(t), m)), lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, m))
  }

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
}
