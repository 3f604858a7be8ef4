package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.functions.Vectors

class SimilaritySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(1f, 0f, 0f)),   // identical to query
    (2L, Array(0f, 1f, 0f)),   // orthogonal
    (3L, Array(-1f, 0f, 0f)),  // opposite
    (4L, Array(1f, 1f, 0f))    // 45 degrees
  ).toDF("vec_id", "embedding")

  test("CosineSim computes exact cosines (codegen path)") {
    Vectors.register(spark)
    emb.createOrReplaceTempView("e")
    val sims = spark.sql(
        "SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s " +
        "FROM e a JOIN e b ON b.vec_id = 0 WHERE a.vec_id <> 0 ORDER BY a.vec_id")
      .as[(Long, Double)].collect().toMap
    assert(sims(1L) == 1.0)
    assert(sims(2L) == 0.0)
    assert(sims(3L) == -1.0)
    assert(math.abs(sims(4L) - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("CosineSim interpreted eval matches codegen result") {
    import graft.functions.CosineSim
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val mk = (a: Array[Float]) =>
      Literal.create(ArrayData.toArrayData(a), ArrayType(FloatType))
    val v = CosineSim(mk(Array(1f, 1f, 0f)), mk(Array(1f, 0f, 0f)))
      .eval(null).asInstanceOf[Double]
    assert(math.abs(v - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("topkCosine ranks identical > diagonal > orthogonal > opposite") {
    val got = Similarity.topkCosine(spark, emb, queryId = 0L, k = 4)
      .select("vec_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 4L, 2L, 3L))
  }

  test("nearDupPairs finds the identical pair above threshold") {
    val got = Similarity.nearDupPairs(spark, emb, threshold = 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(got.contains((0L, 1L)))
  }

  test("annTopk returns a subset of brute-force candidates with matching sims") {
    val brute = Similarity.topkCosine(spark, emb, 0L, 4)
      .as[(Long, Double)].collect().toMap
    val ann = Similarity.annTopk(spark, emb, 0L, 4, numPlanes = 8, bands = 4, dim = 3)
      .as[(Long, Double)].collect()
    assert(ann.nonEmpty)
    ann.foreach { case (id, sim) => assert(brute(id) == sim) }
  }

  test("ivfTopkFixed probes inverted lists and returns exact sims for its candidates") {
    val brute = Similarity.topkCosine(spark, emb, 0L, 4)
      .as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopkFixed(spark, emb, 0L, 4, clusters = 2, nprobe = 2, iters = 1)
      .as[(Long, Double)].collect()
    assert(ivf.nonEmpty)
    // nprobe == clusters => full coverage => must equal brute force exactly
    assert(ivf.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    ivf.foreach { case (id, sim) => assert(brute(id) == sim) }
  }

  test("hyperplanes are deterministic across calls") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  private lazy val testdataEmb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("banded near-dup pairs equal the all-pairs baseline on the driver testdata") {
    val banded = Similarity.nearDupPairsBanded(spark, testdataEmb, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.nearDupPairs(spark, testdataEmb, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(banded.nonEmpty)
    // identical PAIR SET and identical exact sims: the banding only
    // generates candidates, the verify step recomputes true cosines
    assert(banded == exact)
  }

  /** Reference check for [[Similarity.semDedup]]: the paper's
    * upper-triangle rule applied to the EXACT all-pairs sim list
    * (independent candidate generation), scoped by semDedup's own
    * cluster/csim columns. x drops iff some same-cluster y with
    * (csim, id) priority below x's sits above threshold.
    */
  private def assertSemDedupContract(iters: Int, clusters: Int = 8): Set[Long] = {
    val t = 0.4
    val got = Similarity.semDedup(spark, testdataEmb, clusters = clusters,
      threshold = t, iters = iters)
    val rows = got.select("vec_id", "cluster", "csim", "kept")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.length == testdataEmb.count())
    val meta = rows.map { case (id, cl, cs, _) => id -> ((cl, cs)) }.toMap
    val pairs = Similarity.nearDupPairs(spark, testdataEmb, threshold = t)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val expectedDropped = pairs.flatMap { case (x, y) =>
      val ((cx, sx), (cy, sy)) = (meta(x), meta(y))
      val yOutranks = sy < sx || (sy == sx && y < x)
      if (cx != cy) Nil
      else if (yOutranks) Seq(x)  // y holds priority -> x drops
      else Seq(y)                 // pairs are canonical x < y, ids distinct
    }.toSet
    val gotDropped = rows.filter(!_._4).map(_._1).toSet
    assert(gotDropped == expectedDropped,
      s"dropped mismatch: got ${gotDropped.toSeq.sorted} expected ${expectedDropped.toSeq.sorted}")
    assert(gotDropped.nonEmpty, "testdata should contain semantic duplicates")
    rows.filter(_._4).map(_._1).toSet
  }

  test("semDedup drop rule matches the all-pairs baseline on the driver testdata") {
    assertSemDedupContract(iters = 0)
  }

  test("semDedup keeps its contract under Lloyd-refined clusters (library path)") {
    // iters > 0 refines the quantizer through the one fixed-point Lloyd
    // path (refinedCentroids); the cosine priorities over those centroids
    // are engine-internal floats, so this configuration is spec-checked:
    // the drop rule must hold against whatever clustering resulted
    assertSemDedupContract(iters = 2)
  }

  test("Lloyd-refined kept set substantially overlaps the iters=0 oracle config") {
    // the refined quantizer may move borderline vectors across cluster
    // boundaries, but it answers the same question: the two kept sets
    // must agree on the great majority of the corpus (Jaccard >= 0.9) —
    // the recall-style evidence that iters>0 is a refinement, not a
    // different operator
    val kept0 = assertSemDedupContract(iters = 0)
    val kept2 = assertSemDedupContract(iters = 2)
    val jaccard = (kept0 & kept2).size.toDouble / (kept0 | kept2).size
    assert(jaccard >= 0.9, s"kept-set jaccard=$jaccard (0: ${kept0.size}, 2: ${kept2.size})")
  }

  test("clustersFor keeps mean occupancy at the target as the corpus scales") {
    assert(Similarity.clustersFor(1L) == 1)
    assert(Similarity.clustersFor(1000L) == 1)
    assert(Similarity.clustersFor(1001L) == 2)
    assert(Similarity.clustersFor(1000000000L) == 1000000)
    // 100x the corpus -> 100x the clusters: occupancy (and so per-cluster
    // pair volume) is constant; a FIXED k would have gone 10,000x
    assert(Similarity.clustersFor(100L * 1000000000L) == 100 * 1000000)
    assert(Similarity.clustersFor(500L, target = 50L) == 10)
  }

  test("semDedup derived-k default keeps the drop-rule contract") {
    // 500 vectors at the default target -> a single cluster: the rule
    // must degrade to exact all-pairs semantics, not break
    val kept = Similarity.semDedup(spark, testdataEmb, threshold = 0.4)
    assert(kept.select("cluster").distinct().count() == 1)
    assert(kept.filter(!col("kept")).count() > 0)
  }

  test("semDedup plan is cluster-equi-join shaped: no cartesian, no nested loop") {
    val plan = Similarity.semDedup(spark, testdataEmb, clusters = 8, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("IVF with Lloyd refinement reaches recall@10 >= 0.9 vs exact top-k on testdata") {
    // the q_ivf_topk operating point (shallower refinement, wider probe)
    // — test 'ivfTopkFixed returns exact sims' covers the deeper 2/2 one
    val exact = Similarity.topkCosine(spark, testdataEmb, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopkFixed(spark, testdataEmb, queryId = 0L, kNeighbors = 10,
        clusters = 8, nprobe = 3, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall (ivf=$ivf exact=$exact)")
  }

  test("multi-probe LSH recalls at least as much as single-probe on the same index") {
    val planes = Similarity.portablePlanes(16, 64)
    val exact = Similarity.topkCosine(spark, testdataEmb, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val single = Similarity.annTopk(spark, testdataEmb, 0L, 10, planes = planes)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.annTopkMultiprobe(spark, testdataEmb, 0L, 10, planes = planes)
      .select("vec_id").as[Long].collect().toSet
    val rs = (exact & single).size / 10.0
    val rm = (exact & multi).size / 10.0
    // probing Hamming-1 buckets only ever ADDS candidates, so the top-k
    // can only improve toward the exact set
    assert(rm >= rs, s"multi=$rm single=$rs")
    assert(rm >= 0.8, s"multi-probe recall@10 = $rm")
  }

  test("quantizeInt8 bounds: |q| <= 127, max_err <= scale/2, zero vector stays zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 1.0f, 63.5f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df)
      .orderBy("vec_id").as[(Long, Double, Seq[Int], Double)].collect()
    got.foreach { case (id, scale, q, err) =>
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id q out of range: $q")
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err > scale/2 ${scale / 2}")
    }
    val zero = got(1)
    assert(zero._2 == 0.0 && zero._3.forall(_ == 0) && zero._4 == 0.0)
    // extremes land exactly on +/-127
    assert(got(2)._3.take(2).toSeq == Seq(127, -127))
  }

  test("int8 top-k recalls the exact float-dot ranking on real embeddings") {
    val got = Similarity.topkInt8(testdataEmb, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val rows = testdataEmb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val q = rows.find(_._1 == 0L).get._2.map(_.toDouble)
    val exact = rows.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> v.map(_.toDouble).zip(q).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
    val recall = (got & exact).size / 10.0
    // int8 quantization perturbs each coordinate by <= scale/2; ranks at
    // the top of the list are separated well past that on this data
    assert(recall >= 0.8, s"recall=$recall got=$got exact=$exact")
  }

  test("annTopkBatch: one pass resolves every query with exact sims, no cartesian") {
    val batch = Similarity.annTopkBatch(spark, testdataEmb,
      queryPred = pmod(col("vec_id"), lit(20L)) === 0, k = 5)
    val rows = batch.as[(Long, Long, Double, Int)].collect()
    val queries = rows.map(_._1).toSet
    assert(queries.nonEmpty)
    // every reported sim is the true cosine, and each query's candidates
    // rank consistently with the exact brute-force ordering
    queries.foreach { q =>
      val brute = Similarity.topkCosine(spark, testdataEmb, q, 1000)
        .as[(Long, Double)].collect().toMap
      val mine = rows.filter(_._1 == q).sortBy(_._4)
      mine.foreach { case (_, id, sim, _) => assert(brute(id) == sim) }
      assert(mine.map(_._3).toSeq == mine.map(_._3).sortBy(-(_: Double)).toSeq)
    }
    // a batch of queries must not degrade to an all-pairs product
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("annTopk plan is a band equi-join, not a full-scan overlap filter") {
    val plan = Similarity.annTopk(spark, testdataEmb, queryId = 0L, k = 10,
      planes = Similarity.portablePlanes(16, 64))
      .queryExecution.executedPlan.toString
    // candidates must come from a hash join on (band, bkt)...
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(8).mkString("\n"))
    // ...not the old per-row bucket-array overlap over every corpus row
    assert(!plan.contains("arrays_overlap"), "full-scan overlap filter crept back")
    // the only nested-loop allowed is attaching the broadcast 1-row query
    // embedding to surviving candidates
    assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("banded near-dup plan is candidate-equi-join shaped: no cartesian, no nested loop") {
    val plan = Similarity.nearDupPairsBanded(spark, testdataEmb, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("gramUpper matches the brute-force second moments") {
    val vecs = Seq(
      (0L, Array(1f, 2f, 3f)),
      (1L, Array(0.5f, -1f, 0.25f)),
      (2L, Array(-2f, 0f, 4f))
    )
    val got = Similarity.gramUpper(vecs.toDF("vec_id", "embedding"), "embedding")
      .orderBy("i", "j").as[(Int, Int, Long, Double)].collect()
      .map { case (i, j, g12, g) => (i, j) -> (g12, g) }.toMap
    val d = 3
    for (i <- 0 until d; j <- i until d) {
      val expected12 = vecs.map { case (_, v) =>
        math.floor(v(i).toDouble * v(j).toDouble * 1e12).toLong
      }.sum
      val (g12, g) = got((i, j))
      assert(g12 == expected12, s"G12($i,$j) = $g12, expected $expected12")
      assert(g == g12.toDouble / 1e12)
    }
    assert(got.size == d * (d + 1) / 2) // upper triangle only
  }

  test("native gram_agg equals the declarative formulation on the testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val native = Similarity.gramUpper(emb, "embedding")
      .orderBy("i", "j").as[(Int, Int, Long, Double)].collect().toSeq
    val declarative = Similarity.gramUpperDeclarative(emb, "embedding")
      .orderBy("i", "j").as[(Int, Int, Long, Double)].collect().toSeq
    assert(native == declarative)
    assert(native.size == 64 * 65 / 2)
  }

  test("native gram_agg null-element semantics match the declarative sum-skips-null") {
    // a null element contributes to NO cell (null product propagates into
    // sum, which skips it); the rest of the vector still accumulates
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(0L, Seq[Any](1f, null, 3f)),
      Row(1L, Seq[Any](2f, 4f, null)),
      Row(2L, Seq[Any](0.5f, -1f, 0.25f)))
    val df = spark.createDataFrame(rows, schema)
    val native = Similarity.gramUpper(df, "embedding")
      .orderBy("i", "j").as[(Int, Int, Long, Double)].collect().toSeq
    val declarative = Similarity.gramUpperDeclarative(df, "embedding")
      .orderBy("i", "j").as[(Int, Int, Long, Double)].collect().toSeq
    assert(native == declarative)
    // spot-check: cell (0,0) saw all three rows, cell (1,2) only row 2
    val m = native.map { case (i, j, g12, _) => (i, j) -> g12 }.toMap
    assert(m((0, 0)) ==
      Seq(1.0, 4.0, 0.25).map(p => math.floor(p * 1e12).toLong).sum)
    assert(m((1, 2)) == math.floor(-1.0 * 0.25 * 1e12).toLong)
  }

  test("kmeansFixed separates an obviously clustered fixture and is deterministic") {
    // two tight groups around (1,0,0) and (0,1,0); seeds = the 2 lowest
    // vec_ids, one from each group
    val pts = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)), (3L, Array(0.1f, 0.9f, 0f)),
      (4L, Array(0.95f, 0f, 0.05f)), (5L, Array(0f, 0.95f, 0.05f))
    ).toDF("vec_id", "embedding")
    val a = Similarity.kmeansFixed(pts, k = 2, iters = 2)
      .orderBy("vec_id").collect()
    val byId = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == byId(2L) && byId(2L) == byId(4L))
    assert(byId(1L) == byId(3L) && byId(3L) == byId(5L))
    assert(byId(0L) != byId(1L))
    // bit-determinism across runs (the oracle-parity property): same
    // assignments AND same exact integer distances
    val b = Similarity.kmeansFixed(pts, k = 2, iters = 2)
      .orderBy("vec_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("kmeansOnCachedPts over a shared point table matches kmeansFixedFull") {
    // the r13 elbow-sweep overload: one caller-cached quantized table
    // shared by several k's must be bit-identical to the self-caching
    // entry point — assignments AND centroids, for every k in the sweep
    val pts = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)), (3L, Array(0.1f, 0.9f, 0f)),
      (4L, Array(0.95f, 0f, 0.05f)), (5L, Array(0f, 0.95f, 0.05f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeShifted(pts, 1000000L).cache()
    try {
      Similarity.validateShifted(q, 1000000L)
      for (k <- Seq(2, 3)) {
        val (aShared, cShared) = Similarity.kmeansOnCachedPts(pts, q, k, iters = 2)
        val (aSelf, cSelf) = Similarity.kmeansFixedFull(pts, k, iters = 2)
        assert(aShared.orderBy("vec_id").collect().map(_.toSeq).toSeq ==
          aSelf.orderBy("vec_id").collect().map(_.toSeq).toSeq)
        assert(cShared.orderBy("cluster", "pos").collect().map(_.toSeq).toSeq ==
          cSelf.orderBy("cluster", "pos").collect().map(_.toSeq).toSeq)
      }
    } finally q.unpersist()
  }

  test("validateShifted rejects components outside the shift domain") {
    val bad = Seq((0L, Array(2f, 0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeShifted(bad, 1000000L)
    intercept[IllegalArgumentException](Similarity.validateShifted(q, 1000000L))
  }

  test("kmeansFixed refinement does not increase total within-cluster SSE") {
    // Lloyd's invariant: each assign+update round is non-increasing in
    // total squared distance — on the real testdata embeddings, across
    // iteration depths (the refinement must actually refine)
    def sse(iters: Int): Long =
      Similarity.kmeansFixed(testdataEmb, k = 8, iters = iters)
        .agg(sum("dist")).head().getLong(0)
    val s0 = sse(0); val s1 = sse(1); val s2 = sse(2)
    assert(s1 <= s0, s"iter1 SSE $s1 > iter0 $s0")
    assert(s2 <= s1, s"iter2 SSE $s2 > iter1 $s1")
    assert(s2 < s0, "two Lloyd rounds changed nothing on real data")
  }

  test("ivfTopkFixed returns exact sims for its candidates with high recall") {
    val exact = Similarity.topkCosine(spark, testdataEmb, queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refined = Similarity.ivfTopkFixed(spark, testdataEmb, queryId = 0L,
      kNeighbors = 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every reported sim is the exact cosine (re-rank is exact)...
    refined.foreach { case (id, s) =>
      exact.get(id).foreach(e => assert(e == s, s"sim drift for $id")) }
    // ...and the probed lists recall most of the true top-10
    val recall = refined.keySet.intersect(exact.keySet).size / 10.0
    assert(recall >= 0.8, s"refined-IVF recall@10 = $recall")
  }

  test("centroid index: stored-and-probed assignments equal the direct path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cidx").toString + "/idx"
    val corpus = testdataEmb.filter(pmod(col("vec_id"), lit(5L)) < 4)
    val batch = testdataEmb.filter(pmod(col("vec_id"), lit(5L)) === 4)
    Similarity.ensureCentroidIndex(corpus, dir, k = 8, iters = 2)
    val viaIndex = Similarity.assignToCentroidIndex(spark, batch, dir)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    // direct: same centroids computed in-memory, same assignment rule —
    // the parquet round-trip must be lossless (exact integers)
    val (_, cents) = Similarity.kmeansFixedFull(corpus, k = 8, iters = 2)
    val direct = Similarity.assignToCentroids(batch, cents)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty)
    // idempotence: a replayed build leaves the stored index untouched
    val stamp = new java.io.File(dir, "_SUCCESS").lastModified()
    Similarity.ensureCentroidIndex(corpus, dir, k = 8, iters = 2)
    assert(new java.io.File(dir, "_SUCCESS").lastModified() == stamp,
      "replayed ensureCentroidIndex rebuilt an existing index")
    // and the stored table is exactly the recomputed centroid table
    val stored = spark.read.parquet(dir)
      .orderBy("cluster", "pos").collect().map(_.toSeq).toSeq
    val recomputed = cents.orderBy("cluster", "pos").collect().map(_.toSeq).toSeq
    assert(stored == recomputed, "parquet round-trip changed the centroids")
  }

  test("kmeansFixed rejects embeddings outside the shift domain") {
    val bad = Seq((0L, Array(2f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansFixed(bad, k = 2, iters = 1).collect())
    assert(e.getMessage.contains("outside"))
  }

  test("productQuantize: one code per (vector, subspace), codes in [0, k)") {
    val (codes, cb) = Similarity.productQuantize(testdataEmb, m = 4, k = 8, iters = 1)
    val n = testdataEmb.count()
    assert(codes.count() == n * 4, "expected exactly m rows per vector")
    assert(codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).isEmpty)
    assert(codes.filter(col("cluster") < 0 || col("cluster") >= 8).isEmpty)
    assert(codes.filter(col("sub") < 0 || col("sub") >= 4).isEmpty)
    // codebook bounded by m·k·subdim rows regardless of corpus size
    assert(cb.count() <= 4L * 8 * 16)
  }

  test("productQuantize subspace s equals kmeansFixed on the sliced subvectors") {
    // the grouped m-way job must agree with an independent full-dim Lloyd
    // run on just that subspace's slice — same seeds (k lowest vec_ids),
    // same fixed-point arithmetic, so codes AND distances are bit-equal
    val s = 1
    val sliced = testdataEmb.select(col("vec_id"),
      slice(col("embedding"), s * 16 + 1, 16).as("embedding"))
    val direct = Similarity.kmeansFixed(sliced, k = 8, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaPq = Similarity.productQuantize(testdataEmb, m = 4, k = 8, iters = 2)
      ._1.filter(col("sub") === s)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(viaPq == direct)
    assert(viaPq.nonEmpty)
  }

  test("PQ Lloyd refinement does not increase total reconstruction SSE") {
    def sse(iters: Int): Long =
      Similarity.productQuantize(testdataEmb, m = 4, k = 8, iters = iters)
        ._1.agg(sum("dist")).head().getLong(0)
    val s0 = sse(0); val s1 = sse(1); val s2 = sse(2)
    assert(s1 <= s0, s"iter1 SSE $s1 > iter0 $s0")
    assert(s2 <= s1, s"iter2 SSE $s2 > iter1 $s1")
  }

  test("silhouetteFixed: scores in [-1,1], near 1 on well-separated clusters") {
    // same two-cluster fixture as the kmeansFixed test: tight clusters far
    // apart → every point much closer to its own centroid than the other
    val pts = Seq(
      (0L, Array(0.9f, 0.9f)), (2L, Array(0.88f, 0.92f)), (4L, Array(0.91f, 0.89f)),
      (1L, Array(-0.9f, -0.9f)), (3L, Array(-0.88f, -0.92f)), (5L, Array(-0.91f, -0.89f))
    ).toDF("vec_id", "embedding")
    val s6 = Similarity.silhouetteFixed(pts, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s6.size == 6)
    s6.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
    s6.foreach { case (id, v) => assert(v > 0.9, s"vec $id silhouette $v") }
    // and on the real corpus every score stays in range
    val real = Similarity.silhouetteFixed(testdataEmb, k = 8, iters = 2)
      .agg(min("silhouette"), max("silhouette")).head()
    assert(real.getDouble(0) >= -1.0 && real.getDouble(1) <= 1.0)
  }

  test("PQ index: stored-and-probed codes equal the direct path; param mismatch throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqidx").toString + "/idx"
    val corpus = testdataEmb.filter(pmod(col("vec_id"), lit(5L)) < 4)
    val batch = testdataEmb.filter(pmod(col("vec_id"), lit(5L)) === 4)
    Similarity.ensurePqIndex(corpus, dir, m = 8, k = 8, iters = 1)
    val viaIndex = Similarity.encodeWithPqIndex(spark, batch, dir, m = 8)
      .orderBy("vec_id", "sub").collect().map(_.toSeq).toSeq
    // direct: the codebook recomputed IN LINEAGE and probed through the
    // in-memory encode path — the parquet round-trip and the stored-index
    // probe must both be lossless (exact integers)
    val (_, cb) = Similarity.productQuantize(corpus, m = 8, k = 8, iters = 1)
    val direct = Similarity.encodeWithCodebook(batch, cb, m = 8)
      .orderBy("vec_id", "sub").collect().map(_.toSeq).toSeq
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty)
    val stored = spark.read.parquet(dir)
      .orderBy("sub", "cluster", "spos").collect().map(_.toSeq).toSeq
    val recomputed = cb.orderBy("sub", "cluster", "spos").collect().map(_.toSeq).toSeq
    assert(stored == recomputed, "parquet round-trip changed the codebook")
    // idempotence: a replayed build leaves the stored index untouched
    val stamp = new java.io.File(dir, "_SUCCESS").lastModified()
    Similarity.ensurePqIndex(corpus, dir, m = 8, k = 8, iters = 1)
    assert(new java.io.File(dir, "_SUCCESS").lastModified() == stamp,
      "replayed ensurePqIndex rebuilt an existing index")
    // probing with different parameters is corrupt-by-construction
    val e = intercept[IllegalArgumentException](
      Similarity.ensurePqIndex(corpus, dir, m = 8, k = 8, iters = 2))
    assert(e.getMessage.contains("built with"))
  }

  test("randomProjections preserves squared norms in expectation (JL)") {
    // E[proj_j²] = ‖x‖² for ±1 sign planes (Achlioptas); with 16
    // projections the per-vector mean wobbles but the corpus average
    // concentrates hard — and everything is deterministic (fixed planes,
    // fixed data), so the bands are stable across runs
    val m = Similarity.randomProjections(testdataEmb, numProj = 16)
      .groupBy("vec_id").agg((sum(col("val") * col("val")) / 16).as("m"))
    val n2 = testdataEmb.select(col("vec_id"),
      aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b).as("n2"))
    val ratios = m.join(n2, "vec_id")
      .select(col("m") / col("n2")).as[Double].collect()
    assert(ratios.length == testdataEmb.count())
    // hard per-vector bound: proj² ≤ dim·‖x‖² (Cauchy–Schwarz)
    ratios.foreach(r => assert(r >= 0.0 && r <= 64.0, s"ratio $r"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.4, s"corpus mean norm ratio $mean")
  }

  test("semanticMatches: complete above-threshold hits among band candidates, no cartesian") {
    val bench = pmod(col("vec_id"), lit(10L)) === 8L
    val got = Similarity.semanticMatches(spark, testdataEmb, bench, 0.35)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.nonEmpty)
    rows.keys.foreach { case (q, v) => assert(q % 10 == 8 && q != v) }
    // every returned sim is the exact cosine and >= threshold (candidate-
    // set completeness is pinned by the q_sem_decontaminate oracle, which
    // rebuilds the identical band join in SQL)
    val emb = testdataEmb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { case ((q, v), s) =>
      assert(s >= 0.35 && math.abs(cos(emb(q), emb(v)) - s) < 1e-12) }
  }

  test("semanticMatches bucket-df cap equals the hand recompute and drops only hot-bucket mass") {
    import spark.implicits._
    // fixture: a dominant cluster (one direction + tiny noise) whose 60
    // members saturate their (band, bucket) keys far past the cap — the
    // correlated hot pattern the cap exists for — plus a planted COOL
    // near-dup pair and scattered background
    val rng = new scala.util.Random(5)
    val hotBase = Array.fill(64)(rng.nextGaussian())
    val coolBase = Array.fill(64)(rng.nextGaussian())
    val hot = (0L until 60L).map(i =>
      (i, hotBase.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq))
    val planted = Seq(
      (100L, coolBase.map(_.toFloat).toSeq),
      (101L, coolBase.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq))
    val scattered = (200L until 240L).map(i =>
      (i, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val all = hot ++ planted ++ scattered
    val df = all.toDF("vec_id", "embedding")
    val cap = 20
    val pred = pmod(col("vec_id"), lit(2L)) === 0L
    val got = Similarity.semanticMatches(spark, df, pred, 0.6,
        numPlanes = 16, bands = 8, maxBucketDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // hand recompute, independently: per-vector buckets off the same
    // portable planes, occupancy over the WHOLE frame, a pair survives
    // iff it shares >= 1 band whose bucket stays at or under the cap
    val planes = Similarity.portablePlanes(16, 64)
    def buckets(v: Seq[Float]): Seq[Int] = (0 until 8).map { j =>
      (0 until 2).map { r =>
        var d = 0.0
        v.indices.foreach(i => d += v(i).toDouble * planes(j * 2 + r)(i))
        if (d > 0) 1 << r else 0
      }.sum
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bk = all.map { case (id, v) => id -> buckets(v) }.toMap
    val occ = bk.values.flatMap(bs => bs.zipWithIndex.map(_.swap))
      .groupBy(identity).map { case (k, vs) => k -> vs.size }
    def coolShared(a: Long, b: Long): Boolean = (0 until 8).exists(j =>
      bk(a)(j) == bk(b)(j) && occ((j, bk(a)(j))) <= cap)
    val want = (for {
      (q, qv) <- all if q % 2 == 0
      (c, cv) <- all if c != q && coolShared(q, c) && cos(qv, cv) >= 0.6
    } yield (q, c)).toSet
    assert(got.keySet == want, s"got=${got.size} want=${want.size}")
    got.foreach { case ((q, c), s) =>
      assert(math.abs(cos(all.toMap.apply(q), all.toMap.apply(c)) - s) < 1e-9) }
    // the planted cool pair survives the cap
    assert(got.contains((100L, 101L)), "planted cool near-dup lost to the cap")
    // and the cap actually bit: the hot cluster's in-pairs are gone from
    // the capped result but present uncapped
    val uncapped = Similarity.semanticMatches(spark, df, pred, 0.6,
        numPlanes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val droppedHot = (uncapped -- got.keySet)
      .filter { case (q, c) => q < 60 && c < 60 }
    assert(droppedHot.nonEmpty, "cap never dropped a hot-cluster pair")
    // the inline-literal fast path and the broadcast-join fallback
    // compute the identical sentinel rewrite (maxInline = 0 forces the
    // fallback on the same nonempty hot set)
    val wb = Similarity.withLshBuckets(df, planes, 8)
    val hotDf = wb.select(posexplode(col("buckets")).as(Seq("band", "bkt")))
      .groupBy("band", "bkt").agg(count(lit(1)).as("n"))
      .filter(col("n") > cap).select("band", "bkt").localCheckpoint()
    assert(hotDf.count() > 0, "fixture lost its hot buckets")
    def rewritten(maxInline: Long): Map[Long, Seq[Long]] =
      Similarity.applyHotBuckets(wb, "vec_id", 8, hotDf, maxInline)
        .select(col("vec_id"), col("buckets").cast("array<long>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rewritten(Similarity.MaxInlineHotKeys) == rewritten(0L))
  }

  test("semanticMatches with a precomputed hotKeys frame equals the live capBuckets path") {
    import spark.implicits._
    // same shape as the cap fixture: a 60-member correlated cluster that
    // trips the cap, a planted cool pair, scattered background
    val rng = new scala.util.Random(7)
    val hotBase = Array.fill(64)(rng.nextGaussian())
    val coolBase = Array.fill(64)(rng.nextGaussian())
    val all = (0L until 60L).map(i =>
        (i, hotBase.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq)) ++
      Seq((100L, coolBase.map(_.toFloat).toSeq),
        (101L, coolBase.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq)) ++
      (200L until 240L).map(i => (i, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val df = all.toDF("vec_id", "embedding")
    val cap = 20
    val pred = pmod(col("vec_id"), lit(2L)) === 0L
    def asMap(r: Array[org.apache.spark.sql.Row]) =
      r.map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val live = asMap(Similarity.semanticMatches(spark, df, pred, 0.6,
      numPlanes = 16, bands = 8, maxBucketDf = cap).collect())
    // the snapshot-layer form: hot keys derived ONCE (the stamped build's
    // computation), passed back in — must be the identical pair set
    val hot = Similarity.hotBuckets(df, numPlanes = 16, bands = 8,
      maxBucketDf = cap).localCheckpoint()
    assert(hot.count() > 0, "fixture lost its hot buckets")
    val pre = asMap(Similarity.semanticMatches(spark, df, pred, 0.6,
      numPlanes = 16, bands = 8, maxBucketDf = cap, hotKeys = hot).collect())
    assert(pre == live, s"precomputed=${pre.size} live=${live.size}")
    // round 12: the shared-bucket-pass form (lshBucketed once, hot set
    // from hotBucketsOf, buckets passed back via `bucketed`) — the
    // all-live q_media_dedup_hotcap shape — must also be identical
    val wb = Similarity.lshBucketed(df, numPlanes = 16, bands = 8)
      .localCheckpoint()
    val hot2 = Similarity.hotBucketsOf(wb, maxBucketDf = cap).localCheckpoint()
    val shared = asMap(Similarity.semanticMatches(spark, df, pred, 0.6,
      numPlanes = 16, bands = 8, maxBucketDf = cap, hotKeys = hot2,
      bucketed = wb).collect())
    assert(shared == live, s"shared-bucket=${shared.size} live=${live.size}")
  }

  test("pqTopkAdcBatch equals per-query pqTopkAdc on sims, one pass, no cartesian") {
    val batch = Similarity.pqTopkAdcBatch(spark, testdataEmb,
      queryPred = pmod(col("vec_id"), lit(100L)) === 0L, kNeighbors = 5,
      m = 8, k = 8, iters = 2, rerank = 64)
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    val queryIds = got.keySet.map(_._1)
    assert(queryIds.size > 1, "batch should resolve multiple queries")
    // the batched pass must agree with the single-query path per query:
    // same shortlist arithmetic, same exact re-rank
    queryIds.foreach { qid =>
      val single = Similarity.pqTopkAdc(spark, testdataEmb, queryId = qid,
        kNeighbors = 5, m = 8, k = 8, iters = 2, rerank = 64)
        .collect().map(r => (qid, r.getLong(0)) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.view.filterKeys(_._1 == qid).toMap == single,
        s"batch/single divergence for query $qid")
    }
  }

  test("ivfPqTopk: exact re-ranked sims, candidates confined to probed lists") {
    val exact = Similarity.topkCosine(spark, testdataEmb, queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Similarity.ivfPqTopk(spark, testdataEmb, queryId = 0L,
      kNeighbors = 10, coarseK = 8, m = 8, k = 8, iters = 2, nprobe = 2,
      rerank = 64)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    val rows = got.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.nonEmpty)
    // the re-rank stage is exact cosine — any returned true-top-10 member
    // must carry its exact sim
    rows.foreach { case (id, s) =>
      exact.get(id).foreach(e => assert(e == s, s"sim drift for $id")) }
    // residual-PQ ADC within 2-of-8 probed lists still recalls a useful
    // fraction of the true top-10 (IVF recall bounds it from above)
    val recall = rows.keySet.intersect(exact.keySet).size / 10.0
    assert(recall >= 0.5, s"IVF-PQ recall@10 = $recall")
  }

  test("IVF-PQ index: stored-index probe equals train-inline; mismatch throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqidx").toString + "/idx"
    Similarity.ensureIvfPqIndex(testdataEmb, dir, coarseK = 8, m = 8, k = 8,
      iters = 2)
    val viaIndex = Similarity.ivfPqTopkIndexed(spark, testdataEmb, dir,
        queryId = 0L, kNeighbors = 10, m = 8, nprobe = 2, rerank = 64)
      .collect().map(_.toSeq).toSeq
    // train-inline: the same probe over the training recomputed in lineage
    // — the four-table parquet round-trip must be lossless (exact BIGINTs)
    val direct = Similarity.ivfPqTopk(spark, testdataEmb, queryId = 0L,
        kNeighbors = 10, coarseK = 8, m = 8, k = 8, iters = 2, nprobe = 2,
        rerank = 64)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex.nonEmpty)
    assert(viaIndex == direct,
      "stored-index probe diverged from the train-inline composite")
    // idempotence: a replayed build leaves the stored index untouched
    val stamp = new java.io.File(dir, "_SUCCESS").lastModified()
    Similarity.ensureIvfPqIndex(testdataEmb, dir, coarseK = 8, m = 8, k = 8,
      iters = 2)
    assert(new java.io.File(dir, "_SUCCESS").lastModified() == stamp,
      "replayed ensureIvfPqIndex rebuilt an existing index")
    // probing with different parameters is corrupt-by-construction
    val e = intercept[IllegalArgumentException](
      Similarity.ensureIvfPqIndex(testdataEmb, dir, coarseK = 8, m = 8, k = 8,
        iters = 1))
    assert(e.getMessage.contains("built with"))
  }

  test("pqTopkAdc: re-ranked sims are exact and recall the true neighborhood") {
    val exact = Similarity.topkCosine(spark, testdataEmb, queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pq = Similarity.pqTopkAdc(spark, testdataEmb, queryId = 0L,
      kNeighbors = 10, m = 8, k = 8, iters = 2, rerank = 64)
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    val rows = pq.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every reported sim is the exact cosine (re-rank is exact)...
    rows.foreach { case (id, s) =>
      exact.get(id).foreach(e => assert(e == s, s"sim drift for $id")) }
    // ...and a 24-bit code + 64-candidate re-rank recalls the true
    // top-10 on this corpus (measured 0.9; the operating-point sweep
    // that chose m=8/k=8/rerank=64 is in PLANS.md round 6)
    val recall = rows.keySet.intersect(exact.keySet).size / 10.0
    assert(recall >= 0.8, s"PQ-ADC recall@10 = $recall")
  }

  test("SignBandBuckets equals the unrolled when(dot>0) column stack bit-for-bit") {
    // The looped kernel replaced a per-plane column stack whose generated
    // method passed HotSpot's huge-method JIT ceiling at ~48 planes
    // (running interpreted, measured ×77). This holds the two
    // formulations equal on the widths on BOTH sides of that cliff —
    // including near-zero dots, where a float/double divergence would
    // flip a sign — by rebuilding the old stack verbatim as the oracle.
    Vectors.register(spark)
    val rng = new scala.util.Random(11)
    val rows = (0L until 300L).map { i =>
      (i, Array.fill(64)((rng.nextGaussian() * 1e-3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    for (bands <- Seq(4, 8); bits <- Seq(2, 6)) {
      val planes = Similarity.portablePlanes(bands * bits, 64)
      def stackedBit(p: Int) =
        when(call_function("dot_product", col("embedding"),
          typedLit(planes(p))) > 0, 1).otherwise(0)
      val stacked = df.withColumn("buckets",
          array((0 until bands).map(j => (0 until bits)
            .map(r => stackedBit(j * bits + r) * lit(1 << r))
            .reduce(_ + _)): _*))
        .select("vec_id", "buckets")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val looped = Similarity.withLshBuckets(df, planes, bands)
        .select("vec_id", "buckets")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(looped == stacked, s"bands=$bands bits=$bits diverged")
    }
    // null embedding: the stacked when(null > 0, 1).otherwise(0) collapsed
    // every bit to 0 — the kernel must keep that (all-zero array, not null)
    val withNull = spark.sql(
      "SELECT CAST(NULL AS ARRAY<FLOAT>) AS embedding")
    val planes = Similarity.portablePlanes(16, 64)
    val out = Similarity.withLshBuckets(withNull, planes, 8)
      .select("buckets").collect()(0)
    assert(!out.isNullAt(0) && out.getSeq[Int](0) == Seq.fill(8)(0))
  }
}
