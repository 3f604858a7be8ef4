package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complete near-duplicate pairs in 64-bit Hamming space — the candidate
  * primitive under every perceptual-hash dedup (image average-hash, audio
  * energy-delta fingerprint, per-frame video phash).
  *
  * The round-8 scheme banded the signature 4×16 and equi-joined on
  * (band, key): pigeonhole-complete at Hamming ≤ 3, but 16-bit keys
  * SATURATE — perceptual hashes are heavily '1'-biased (text pixels sit
  * above the pad-depressed mean), so the per-band key space collapses to
  * a few hundred effective patterns and bucket occupancy grows with the
  * corpus: measured candidates 187k at 5.2k docs → 7.77M at 52k
  * (×41.7 at ×10 data — quadratic by key exhaustion) while TRUE pairs
  * grew ×9.4. No 4-piece partition can fix this: completeness at r=3
  * pins the piece width at 16 bits, and the entropy deficit is in the
  * hash, not the split.
  *
  * This is multi-index Hamming search instead (Norouzi, Punjani & Fleet,
  * CVPR 2012, "Fast search in Hamming space with multi-index hashing"):
  * split the signature into TWO 32-bit halves — at Hamming ≤ 3 one half
  * carries ≤ 1 flip (3 < 2·2) — and probe each half's Hamming-1 BALL:
  * the probe side emits 33 keys per half (identity + 32 single-bit
  * flips), the index side its identity key, and the equi-join on
  * (half, key) is complete at Hamming ≤ 3 with 32-bit keys whose
  * occupancy is the IDENTICAL-HALF class size (measured max 51 at 52k
  * docs). Join volume re-measured on the same corpora: 20.3k → 249k at
  * ×10 data (×12.3 — linear), 40× fewer candidates at the base scale.
  *
  * `maxKeyDf` — the stop-shingle move applied to Hamming space. When the
  * signature distribution carries ATOMS (fixed patterns with constant
  * probability mass — e.g. per-frame video hashes: the pad-dominated
  * tail frame's second half is all-zero in EVERY document, and common
  * text shapes repeat), identical-half class sizes grow ∝ corpus and the
  * equality join is quadratic no matter how wide the key. A hot half-key
  * carries no discriminative signal — exactly a stop shingle — so with
  * maxKeyDf = Some(cap), a pair qualifies through half h only when BOTH
  * endpoints' own h-keys sit in buckets of ≤ cap members. Candidates are
  * then ≤ Σ_cool occ² ≤ cap·n — linear by construction (measured on the
  * video-frame corpus at cap 32: 242k → 1.78M at ×10, vs 7.2M → 866M
  * uncapped); recall is lost ONLY for pairs whose every qualifying half
  * is a mass pattern — the pairs a containment gate gets no evidence
  * from anyway. None (the default) keeps the complete join for
  * signatures whose class sizes are corpus-independent (doc-level
  * image/audio hashes — measured linear without the cap).
  *
  * Row-local dedup, no distinct(): within a half a qualifying pair
  * collides on EXACTLY one probe key (identity when the halves are
  * equal, else the single differing bit), and a pair qualifying on both
  * halves is kept only at half 0 (the firstSharedBand trick — half 1
  * requires NOT(qualified-via-half-0), computable in-row because both
  * sides carry their halves and cool flags). Everything is codegen'd
  * builtins: sequence explode, shiftleft/xor, bit_count — no
  * higher-order lambdas on the fan-out path.
  *
  * Input: (idCol, h1, h2) with h1/h2 the signature's packed 32-bit
  * halves as non-negative longs. Output: (id_a, id_b, hamming) for every
  * pair with id_a < id_b and Hamming(sig_a, sig_b) ≤ maxHamming.
  */
object Hamming {

  /** Contract check, enforced per row: the probe ball only flips bits
    * 0-31, so a half wider than 32 bits (or negative) would be SILENTLY
    * incomplete — fail the job loudly instead (raise_error is codegen'd;
    * the branch is never taken on valid input). Output: (id, h1, h2).
    */
  private[sim] def checkedHalves(h: DataFrame, idCol: String): DataFrame = {
    def ck(c: String) = when(col(c) < 0 || col(c) > lit(0xFFFFFFFFL),
      raise_error(concat(lit(s"Hamming: $c out of the packed " +
        "32-bit half range [0, 0xFFFFFFFF]: "), col(c).cast("string"))))
      .otherwise(col(c)).as(c)
    h.select(col(idCol).as("id"), ck("h1"), ck("h2"))
  }

  /** Probe side of the MIH join: i in [0, 65]; half = i div 33,
    * j = i mod 33; key = identity at j = 0, else the half with bit j-1
    * flipped. Rows whose own key is hot on a half emit no probes for
    * that half. Input: (id, h1, h2, c1, c2); output carries the halves
    * and cool flags for the in-row verify.
    */
  private[sim] def probeSide(base: DataFrame): DataFrame =
    base.select(col("id").as("id_a"),
        col("h1").as("a1"), col("h2").as("a2"),
        col("c1").as("ac1"), col("c2").as("ac2"),
        explode(sequence(lit(0), lit(65))).as("i"))
      .filter(when(col("i") < 33, col("ac1")).otherwise(col("ac2")))
      .select(col("id_a"), col("a1"), col("a2"), col("ac1"), col("ac2"),
        (col("i") >= 33).cast("int").as("half"),
        when(col("i") % 33 === 0,
            when(col("i") < 33, col("a1")).otherwise(col("a2")))
          .otherwise(
            when(col("i") < 33, col("a1")).otherwise(col("a2"))
              .bitwiseXOR(expr("shiftleft(1L, CAST(i % 33 - 1 AS INT))")))
          .as("k"))

  /** Index side of the MIH join: the two identity keys (posexplode: pos
    * IS the half), hot-key rows dropped per half. Input as [[probeSide]].
    */
  private[sim] def indexSide(base: DataFrame): DataFrame =
    base.select(col("id").as("id_b"),
        col("h1").as("b1"), col("h2").as("b2"),
        col("c1").as("bc1"), col("c2").as("bc2"),
        posexplode(array(col("h1"), col("h2"))).as(Seq("half", "k")))
      .filter(when(col("half") === 0, col("bc1")).otherwise(col("bc2")))

  /** The (half, key) equi-join + in-row cross-half dedup + Hamming
    * verify. Emits (id_a, id_b, hamming) in probe→index orientation,
    * UN-ordered: each matching (probe row, index row) pair appears
    * exactly once — the symmetric caller filters id_a < id_b to halve
    * its two orientations; an asymmetric (batch-vs-index) caller
    * canonicalizes with least/greatest instead.
    */
  private[sim] def matched(probes: DataFrame, index: DataFrame,
                           maxHamming: Int): DataFrame =
    probes.join(index, Seq("half", "k"))
      .filter(col("id_a") =!= col("id_b"))
      // cross-half dedup: a pair qualifying on BOTH halves is kept only
      // at half 0 — half 1 requires NOT(qualified via half 0), an in-row
      // test over the carried halves and cool flags (within a half the
      // colliding probe key is unique, so no distinct() is needed)
      .filter(col("half") === 0 ||
        !(expr("bit_count(a1 ^ b1) <= 1") && col("ac1") && col("bc1")))
      .withColumn("hamming", expr(
        "CAST(bit_count(a1 ^ b1) + bit_count(a2 ^ b2) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** Half-key df cap for the IMAGE phash family (q_image_dedup, the
    * MihIndex ingest loop, store:mih_probe). Round 11's standing skew
    * gate caught identical-half class sizes growing with the corpus at
    * the ×100 decade (skew3:mih_halfkey np ×70.3; max class 3639 on the
    * all-ones half — saturated/pad-dominated rasters, the r8 failure
    * class one representation later), overturning the round-8
    * measurement ("doc-level image hashes are corpus-independent" held
    * only to ×10). The BucketSkew mih cap→kept-mass curve: occupancy max
    * 3 / 25 / 51 / 3639 at sf0.01 / sf0.1 / ×10 / ×100 — so 64 is
    * VACUOUS at every oracle SF and at the ×10 decade (bucket oracles
    * and decade rows unchanged) and bounds the ×100+ join at
    * cap·n — the stop-shingle rule in Hamming space, recall lost only
    * for pairs whose every qualifying half is a mass pattern.
    */
  val ImageMaxKeyDf: Int = 64

  private[sim] def requireMaxHamming(maxHamming: Int): Unit =
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming — the two-half Hamming-1-ball scheme is " +
        "complete only up to 3 (one half must carry <= 1 flip)")

  def nearPairs(h: DataFrame, idCol: String, maxHamming: Int = 3,
                maxKeyDf: Option[Int] = None): DataFrame = {
    requireMaxHamming(maxHamming)
    val checked = checkedHalves(h, idCol)
    // per-row cool flags: is this row's OWN key on each half in a bucket
    // of <= cap members? (true everywhere when no cap is set)
    val base = maxKeyDf match {
      case None =>
        checked.select(col("id"), col("h1"), col("h2"),
          lit(true).as("c1"), lit(true).as("c2"))
      case Some(cap) =>
        require(cap > 0, s"maxKeyDf=$cap must be positive")
        val o1 = checked.groupBy(col("h1").as("k1")).agg(count(lit(1)).as("n1"))
        val o2 = checked.groupBy(col("h2").as("k2")).agg(count(lit(1)).as("n2"))
        checked.select(col("id"), col("h1"), col("h2"))
          .join(o1, col("h1") === col("k1"))
          .join(o2, col("h2") === col("k2"))
          .select(col("id"), col("h1"), col("h2"),
            (col("n1") <= cap).as("c1"), (col("n2") <= cap).as("c2"))
    }
    matched(probeSide(base), indexSide(base), maxHamming)
      // symmetric self-join: both orientations matched — keep one
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
