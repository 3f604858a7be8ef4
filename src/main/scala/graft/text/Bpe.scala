package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge training (Sennrich et al. 2016, the tokenizer-training
  * algorithm of GPT/Llama-family vocabularies): start from characters,
  * repeatedly merge the globally most frequent adjacent symbol pair.
  * The reference has nothing like it; an LLM-data engine trains its
  * tokenizer from the same corpus it curates (SURVEY.md §2.9 X3).
  *
  * Classic trainer shape — and the reason it scales: merges are learned
  * over the WORD-FREQUENCY TABLE (distinct words + counts, built once by
  * a map-side-combinable aggregate), never the raw corpus. Every round
  * is (1) a pair-count aggregate over the vocab, (2) a one-row global
  * argmax with the deterministic tie rule (freq desc, then lexicographic
  * pair — the classic implementation breaks ties by insertion order,
  * which no two engines share), broadcast back in-plan (no driver
  * collect), and (3) a leftmost-greedy merge applied per word by a
  * string fold whose CASE chain is bit-identical in DuckDB's
  * list_reduce — so the learned merge table is exactly replayable.
  *
  * Symbols are space-joined inside a string (tokens are whitespace-split
  * upstream, so the separator cannot collide); `ends_with(acc, ' ' || l)`
  * matches only a whole trailing symbol. No end-of-word marker (a
  * documented simplification — merges can then span into any later
  * occurrence boundary equally on both engines).
  */
object Bpe {

  /** The corpus word-frequency table with each word exploded to its
    * character-symbol string: (w, cnt, syms). */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", array_join(split(col("w"), ""), " "))

  /** Weighted adjacent-pair counts over the current symbol table. */
  def pairCounts(v: DataFrame): DataFrame = {
    val sa = split(col("syms"), " ")
    val n1 = greatest(size(sa) - 1, lit(0))
    v.select(col("cnt"),
        explode(zip_with(slice(sa, lit(1), n1), slice(sa, lit(2), n1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("freq"))
  }

  /** Leftmost-greedy single-pair merge over a space-joined symbol string:
    * fold symbols left to right, and when the accumulated string ends in
    * the WHOLE symbol `l` and the next symbol is `r`, append `r` without
    * a separator — the two symbols fuse into l||r. A just-fused symbol
    * can never re-fuse (it no longer equals `l`), which IS the leftmost
    * non-overlapping rule.
    */
  def foldMerge(syms: Column, l: Column, r: Column): Column =
    aggregate(split(syms, " "), lit(""), (acc, x) =>
      when(acc === lit(""), x)
        .when(x === r && (acc === l ||
          acc.endsWith(concat(lit(" "), l))), concat(acc, r))
        .otherwise(concat(acc, lit(" "), x)))

  /** Learn `rounds` merges. Returns (round, l, r, freq) — the ordered
    * merge table a BPE tokenizer consumes. Each round's argmax is a
    * one-row broadcast joined back in-plan; the evolving vocab table is
    * localCheckpoint'd per round (constant-depth lineage, the iterative
    * discipline shared with PageRank/Lloyd).
    */
  def merges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds")
    var v = vocab(docs).localCheckpoint()
    val learned = (1 to rounds).map { i =>
      val mp = pairCounts(v)
        .orderBy(col("freq").desc, col("l"), col("r")).limit(1)
        .localCheckpoint() // 1 row
      v = v.crossJoin(broadcast(mp.select(col("l").as("_l"), col("r").as("_r"))))
        .withColumn("syms", foldMerge(col("syms"), col("_l"), col("_r")))
        .select("w", "cnt", "syms")
        .localCheckpoint()
      mp.withColumn("round", lit(i))
    }
    learned.reduce(_ unionByName _).select("round", "l", "r", "freq")
  }

  /** The encode half: re-segment every corpus token by the `rounds`
    * learned merges applied IN ORDER, and count BPE symbols per doc —
    * the number a sequence-packing / token-budget pipeline consumes.
    * Each merge is one broadcast 1-row join + the same fold the trainer
    * used, over the exploded (doc, word) stream — map-heavy, one final
    * combinable aggregate. (Assumes `rounds` non-exhausted merges exist,
    * as on any real corpus; an exhausted round's empty argmax would
    * empty the chain.)
    */
  def encodeCounts(docs: DataFrame, rounds: Int): DataFrame = {
    val m = merges(docs, rounds).localCheckpoint()
    var words = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .withColumn("syms", array_join(split(col("w"), ""), " "))
    for (i <- 1 to rounds) {
      val mi = m.filter(col("round") === i)
        .select(col("l").as("_l"), col("r").as("_r"))
      words = words.crossJoin(broadcast(mi))
        .withColumn("syms", foldMerge(col("syms"), col("_l"), col("_r")))
        .drop("_l", "_r")
    }
    words.groupBy("doc_id")
      .agg(sum(size(split(col("syms"), " "))).as("n_bpe"))
  }
}
