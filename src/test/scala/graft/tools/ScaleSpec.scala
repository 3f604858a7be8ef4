package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Scale-proportionality gate inside `sbt test`: the heavy dedup/graph
  * family must grow its shuffle-write volume ≤ ~linearly between
  * sf0.001 and sf0.01 (10× the data). Runtime at these tiny SFs is pure
  * fixed overhead, so the SPEC asserts on bytes — the complexity-class
  * signal — while the committed SCALE artifact (graft.tools.ScaleProbe at
  * sf0.01 vs sf0.1, 32 cores) records both. A quadratic candidate blowup
  * (the failure mode the df caps / banding / prefix bounds exist to
  * prevent) multiplies bytes by ~growth² = 100× and fails the rule; the
  * slack and absolute allowance in [[ScaleProbe.isLinear]] keep benign
  * log-factors and broadcast→shuffle plan transitions from false-failing.
  */
class ScaleSpec extends AnyFunSuite with SparkSuite {

  test("heavy family shuffle bytes grow ≤ ~linearly from sf0.001 to sf0.01") {
    val probe = new TaskProbe
    spark.sparkContext.addSparkListener(probe)
    try {
      val bad = ScaleProbe.HeavyFamily.flatMap { name =>
        val a = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.001")
        val b = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.01")
        info(f"$name%-18s ${a.shuffleBytes}%10dB -> ${b.shuffleBytes}%10dB " +
          f"(×${if (a.shuffleBytes > 0) b.shuffleBytes.toDouble / a.shuffleBytes else -1}%.2f)")
        if (ScaleProbe.isLinear(a.shuffleBytes, b.shuffleBytes, growth = 10.0)) None
        else Some(s"$name: ${a.shuffleBytes}B -> ${b.shuffleBytes}B")
      }
      assert(bad.isEmpty, s"SUPER-LINEAR shuffle growth: ${bad.mkString("; ")}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("vector family shuffle bytes stay flat from sf0.001 to sf0.01 (same embeddings)") {
    // the embeddings table is IDENTICAL at sf0.001 and sf0.01 (500 rows;
    // the driver scales it on its own schedule), so in-test the PQ/kNN/
    // Lloyd family is a pure plan-stability check: same data must give
    // ~same bytes (growth=1.0 → big ≤ 2.5×small + allowance). The real
    // 4×-growth measurement runs in ScaleProbe at sf0.01→sf0.1 and is
    // committed as the SCALE artifact.
    val probe = new TaskProbe
    spark.sparkContext.addSparkListener(probe)
    try {
      val bad = ScaleProbe.VectorFamily.flatMap { name =>
        val a = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.001")
        val b = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.01")
        info(f"$name%-18s ${a.shuffleBytes}%10dB -> ${b.shuffleBytes}%10dB " +
          f"(×${if (a.shuffleBytes > 0) b.shuffleBytes.toDouble / a.shuffleBytes else -1}%.2f)")
        if (ScaleProbe.isLinear(a.shuffleBytes, b.shuffleBytes, growth = 1.0)) None
        else Some(s"$name: ${a.shuffleBytes}B -> ${b.shuffleBytes}B")
      }
      assert(bad.isEmpty, s"shuffle volume not stable on identical data: ${bad.mkString("; ")}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("artifact builds' shuffle bytes grow ≤ ~linearly from sf0.001 to sf0.01") {
    // the stamped derived tables moved the scale cost out of their
    // consumers and into the one-time builds — so the builds themselves
    // are probed FRESH (raw derivation, no stamp read). Embeddings-backed
    // builds ride the identical-table growth=1.0 rule (see above).
    val probe = new TaskProbe
    spark.sparkContext.addSparkListener(probe)
    try {
      val bad = ScaleProbe.BuildFamily.map(_._1).flatMap { name =>
        val growth = if (ScaleProbe.growthFor(name) == 4.0) 1.0 else 10.0
        val a = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.001")
        val b = ScaleProbe.measure(spark, probe, name, "/root/testdata/sf0.01")
        info(f"$name%-22s ${a.shuffleBytes}%10dB -> ${b.shuffleBytes}%10dB " +
          f"(×${if (a.shuffleBytes > 0) b.shuffleBytes.toDouble / a.shuffleBytes else -1}%.2f)")
        if (ScaleProbe.isLinear(a.shuffleBytes, b.shuffleBytes, growth)) None
        else Some(s"$name: ${a.shuffleBytes}B -> ${b.shuffleBytes}B")
      }
      assert(bad.isEmpty, s"SUPER-LINEAR build shuffle growth: ${bad.mkString("; ")}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("isLinear rule: linear passes, quadratic fails, plan transition tolerated") {
    val mb = 1L << 20
    // 10× data, 10× bytes with room to spare
    assert(ScaleProbe.isLinear(100 * mb, 1000 * mb, growth = 10.0))
    // benign log-factor residue (×18 at 10× growth) stays inside slack
    assert(ScaleProbe.isLinear(100 * mb, 1800 * mb, growth = 10.0))
    // quadratic: 100× bytes at 10× data must fail
    assert(!ScaleProbe.isLinear(100 * mb, 10000 * mb, growth = 10.0))
    // broadcast→shuffle transition out of a near-zero base: allowed
    assert(ScaleProbe.isLinear(0, 20 * mb, growth = 10.0))
    // ...but a transition straight into real volume is not
    assert(!ScaleProbe.isLinear(0, 200 * mb, growth = 10.0))
  }
}
