package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.entry.EntryHelpers._

/** Round-6 mining/statistics additions: trend regression, digit-law and
  * change-point data-quality probes, two more TPC-H shapes (Q12 ship-lag,
  * Q21 waiting-supplier), link prediction over the co-purchase graph
  * (Adamic-Adar, neighbor Jaccard), association rules, sorted-neighborhood
  * dedup blocking, and per-document unigram perplexity.
  *
  * One `queries` entry per operator (driver contract) with its DuckDB
  * `oracleSql` twin; all counts exact integers, all transcendentals one
  * rounded libm call (the round-9 convention), all float accumulation
  * through exact decimals — so every query hash-matches cross-engine.
  */
private[graft] object MiningQueries {

  /** A2+ OLS trend of daily revenue: slope/intercept of (day-index,
    * daily-revenue-cents) by the closed-form normal equations. Every sum
    * (n, Σx, Σx², Σxy, Σy) is an exact BIGINT from one combinable
    * aggregate over the day-count table (x is anchored at the min day so
    * the products stay far from overflow at any SF); the final formula
    * runs in IEEE doubles over those exact integers — bit-identical
    * cross-engine. The classic "is ingest volume growing" probe.
    */
  private def qOlsTrend(s: SparkSession, dir: String): DataFrame = {
    val dayrev = read(s, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("yq"))
    val m = dayrev.agg(min("d").as("mind"))
    val xy = dayrev.crossJoin(broadcast(m))
      .select(datediff(col("d"), col("mind")).cast("long").as("x"), col("yq"))
    val sums = xy.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("yq")).as("sxy"),
      sum("yq").as("sy"))
    val (nD, sxD, sxxD, sxyD, syD) =
      (col("n").cast("double"), col("sx").cast("double"), col("sxx").cast("double"),
        col("sxy").cast("double"), col("sy").cast("double"))
    val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    sums.select(col("n").as("n_days"),
      round(slope, 9).as("slope_cents_per_day"),
      round((syD - slope * sxD) / nD, 9).as("intercept_cents"))
  }

  /** A2+ Benford first-digit audit over order totals — the fraud/synthetic-
    * data smell test. The leading digit comes from the integer part cast
    * through a string (identical across engines, no log10 boundary risk);
    * observed shares are exact-count ratios; the Benford expectation is the
    * one rounded transcendental. Map-side-combinable 9-row output.
    */
  private def qBenford(s: SparkSession, dir: String): DataFrame = {
    val d = read(s, dir, "orders").select(
      substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val t = d.agg(count(lit(1)).as("n"))
    d.groupBy("digit").agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(t))
      .select(col("digit"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n").cast("double"), 9).as("observed"),
        round(log((col("digit") + 1).cast("double") / col("digit").cast("double"))
          / log(lit(10.0)), 9).as("benford"))
      .orderBy("digit")
  }

  /** A2+ CUSUM change-point trace of daily event volume, fully integer:
    * the classic scaled cumulative deviation N·Σ_{j≤i}c_j − i·Σc (zero at
    * both ends, extremum at the change point) needs no mean division, so
    * the whole trace is exact BIGINTs. Corpus work is one combinable daily
    * count; the window runs over the day spine only (day-count-bounded,
    * like q_forecast_eval's).
    */
  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = read(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
    val t = daily.agg(count(lit(1)).as("nd"), sum("c").as("tot"))
    val wo = Window.orderBy("d")
    daily.crossJoin(broadcast(t))
      .withColumn("cum", sum("c").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(wo).cast("long"))
      .select(col("d"), col("c"),
        (col("nd") * col("cum") - col("rn") * col("tot")).as("cusum_scaled"))
      .orderBy("d")
  }

  /** TPC-H Q12 shape (ship-mode → ship-lag, our lineitem carries no
    * shipmode): bucket every lineitem by its order-to-ship lag and split
    * line counts by priority class — one fact-fact equi-join and one
    * conditional aggregation, 4-row output. The join key is the natural
    * orderkey co-partitioning; at 100 TB this is the bucketed-join case.
    */
  private def qSqlShipLag(s: SparkSession, dir: String): DataFrame = {
    val j = read(s, dir, "lineitem")
      .join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("lag"),
        col("o_orderpriority"))
    val bucket = when(col("lag") < 0, "0_early").when(col("lag") <= 90, "1_0-90")
      .when(col("lag") <= 365, "2_91-365").otherwise("3_over365")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j.groupBy(bucket.as("lag_bucket"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("lag_bucket")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting), in the
    * aggregation formulation instead of the textbook EXISTS/NOT-EXISTS
    * self-joins: one pass groups each finished order's lines into
    * (distinct suppliers, distinct LATE suppliers, the late supplier when
    * unique), then "multi-supplier order where exactly one supplier
    * shipped >60 days late" is a plain filter — same semantics, no
    * correlated-subquery re-scans, linear in lineitem at any SF.
    */
  private def qSqlWaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val late = (datediff(col("l_shipdate"), col("o_orderdate")) > 60).cast("int")
    val per = read(s, dir, "lineitem")
      .join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"), late.as("late"))
      .groupBy("ok")
      .agg(countDistinct("sk").as("ns"),
        countDistinct(when(col("late") === 1, col("sk"))).as("nlate"),
        max(when(col("late") === 1, col("sk"))).as("late_sk"))
    per.filter(col("ns") >= 2 && col("nlate") === 1)
      .join(read(s, dir, "supplier"), col("late_sk") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  /** Symmetrized support-≥2 co-purchase edges + degrees — the shared base
    * of the two link-prediction queries. The support filter is the hub
    * cap: it bounds degrees the way the stop-shingle df cap bounds
    * inverted lists, keeping the wedge join linear-ish in edges.
    */
  private def linkBase(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val e = GraphQualityQueries.basketPairs(read(s, dir, "lineitem"))
      .filter(col("support") >= 2)
      .select(col("pa").as("a"), col("pb").as("b"))
      .localCheckpoint()
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("deg"))
    (e, sym, deg)
  }

  /** X4+ Adamic-Adar link prediction on the co-purchase graph: for
    * non-adjacent part pairs, Σ_z∈N(x)∩N(y) 1/ln(deg z) — the classic
    * "which products WILL be bought together" score. Wedges come from one
    * equi-join of the symmetrized edge list on the shared neighbor (never
    * an all-pairs); each wedge contributes one rounded transcendental
    * accumulated in exact decimals; existing edges leave by anti-join;
    * bounded top-30 output.
    */
  private def qAdamicAdar(s: SparkSession, dir: String): DataFrame = {
    val (e, sym, deg) = linkBase(s, dir)
    val n1 = sym.select(col("a").as("z"), col("b").as("x"))
    val wedges = n1.join(n1.select(col("z"), col("x").as("y")), "z")
      .filter(col("x") < col("y"))
    val contrib = round(lit(1.0) / log(col("deg").cast("double")), 9)
      .cast(DecimalType(28, 9))
    val aa = wedges.join(deg, "z")
      .groupBy("x", "y")
      .agg(count(lit(1)).as("n_common"), sum(contrib).as("scored"))
    aa.join(e, aa("x") === e("a") && aa("y") === e("b"), "left_anti")
      .select(col("x").as("part_x"), col("y").as("part_y"), col("n_common"),
        col("scored").cast("double").as("aa_score"))
      .orderBy(col("aa_score").desc, col("part_x"), col("part_y")).limit(30)
  }

  /** X4+ neighbor-Jaccard node similarity (structural equivalence): for
    * each 2-hop part pair |N(x)∩N(y)| / |N(x)∪N(y)| from the same wedge
    * machinery as q_adamic_adar — counts exact integers, one double
    * division rounded at the end, bounded top-30.
    */
  private def qNodeJaccard(s: SparkSession, dir: String): DataFrame = {
    val (_, sym, deg) = linkBase(s, dir)
    val n1 = sym.select(col("a").as("z"), col("b").as("x"))
    val common = n1.join(n1.select(col("z"), col("x").as("y")), "z")
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    common
      .join(deg.select(col("z").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("z").as("y"), col("deg").as("dy")), "y")
      .select(col("x").as("part_x"), col("y").as("part_y"), col("c").as("n_common"),
        round(col("c").cast("double") / (col("dx") + col("dy") - col("c")).cast("double"), 9)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("part_x"), col("part_y")).limit(30)
  }

  /** A1+ association rules from frequent pairs: confidence and lift for
    * both directions of every support-≥3 co-purchase pair — the actionable
    * form of market-basket mining. All counts exact integers through the
    * shared in-row basket explode; two rounded divisions per rule; bounded
    * top-30 by lift.
    */
  private def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val pp = li.select("l_orderkey", "l_partkey").distinct()
    val nb = pp.agg(countDistinct("l_orderkey").as("nb"))
    val freq = pp.groupBy(col("l_partkey").as("p")).agg(count(lit(1)).as("n_p"))
    val pairs = GraphQualityQueries.basketPairs(li).filter(col("support") >= 3)
    val rules = pairs.select(col("pa").as("ante"), col("pb").as("cons"), col("support"))
      .union(pairs.select(col("pb").as("ante"), col("pa").as("cons"), col("support")))
    rules
      .join(freq.select(col("p").as("ante"), col("n_p").as("n_a")), "ante")
      .join(freq.select(col("p").as("cons"), col("n_p").as("n_c")), "cons")
      .crossJoin(broadcast(nb))
      .select(col("ante"), col("cons"), col("support"),
        round(col("support").cast("double") / col("n_a").cast("double"), 9).as("confidence"),
        round(col("support").cast("double") * col("nb").cast("double")
          / (col("n_a") * col("n_c")).cast("double"), 9).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons")).limit(30)
  }

  /** X1+ sorted-neighborhood blocking (the entity-resolution classic):
    * sort documents by a normalized key, compare each doc only to its w=2
    * successors WITHIN its 2-char prefix block — per-block windows keep
    * the sort distributed (no global single-partition window), candidate
    * count ≤ 2·n, then an exact token-Jaccard verify keeps real matches.
    * The cheap deterministic complement to MinHash-LSH for short keys.
    */
  private def qSortedBlocking(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
      .select(col("doc_id"), trim(lower(col("text"))).as("nt"))
      .withColumn("key", substring(col("nt"), 1, 16))
      .withColumn("blk", substring(col("nt"), 1, 2))
    val wo = Window.partitionBy("blk").orderBy("key", "doc_id")
    val x = docs
      .withColumn("b1", lead("doc_id", 1).over(wo)).withColumn("t1", lead("nt", 1).over(wo))
      .withColumn("b2", lead("doc_id", 2).over(wo)).withColumn("t2", lead("nt", 2).over(wo))
    def pairsAt(b: String, t: String): DataFrame = x.filter(col(b).isNotNull)
      .select(col("doc_id").as("da"), col(b).as("db"), col("nt").as("ta"), col(t).as("tb"))
    val cand = pairsAt("b1", "t1").union(pairsAt("b2", "t2"))
    def toks(c: Column): Column = array_distinct(split(c, "\\s+"))
    val inter = size(array_intersect(toks(col("ta")), toks(col("tb"))))
    val uni = size(toks(col("ta"))) + size(toks(col("tb"))) - inter
    cand
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        round(inter.cast("double") / uni.cast("double"), 9).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  /** X3+ per-document unigram perplexity under the corpus's own language
    * model — the fluency/outlier score of pretraining curation (a doc the
    * corpus LM finds surprising is boilerplate, noise, or off-domain).
    * Token counts are exact; each distinct token costs one rounded -ln(p);
    * per-doc accumulation is exact decimal; one exp at the end (rounded
    * to 6). Join is token→vocab (broadcast-sized), aggregation
    * map-side-combinable — linear at any SF.
    */
  private def qPerplexity(s: SparkSession, dir: String): DataFrame = {
    val toks = read(s, dir, "documents")
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val tot = toks.agg(count(lit(1)).as("nt"))
    val nll = round(-log(col("cw").cast("double") / col("nt").cast("double")), 9)
      .cast(DecimalType(28, 9))
    val avg = col("nll").cast("double") / col("n_tokens").cast("double")
    toks.join(vocab, "w").crossJoin(broadcast(tot))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"), sum(nll).as("nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(avg, 9).as("avg_nll"), round(exp(avg), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** This family's share of SparkEntry.queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ols_trend" -> (qOlsTrend _),
    "q_benford" -> (qBenford _),
    "q_cusum" -> (qCusum _),
    "q_sql_ship_lag" -> (qSqlShipLag _),
    "q_sql_waiting_supplier" -> (qSqlWaitingSupplier _),
    "q_adamic_adar" -> (qAdamicAdar _),
    "q_node_jaccard" -> (qNodeJaccard _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_sorted_blocking" -> (qSortedBlocking _),
    "q_perplexity" -> (qPerplexity _),
  )

  /** Shared co-purchase link-prediction CTE prefix (mirrors linkBase):
    * support-≥2 canonical edges → symmetrized → degrees → wedges. */
  private val linkCtes: String =
    """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b
      |  FROM pp a JOIN pp b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
      |w AS (
      |  SELECT s1.b AS x, s2.b AS y, s1.a AS z
      |  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b)""".stripMargin

  /** This family's share of SparkEntry.oracleSql. */
  def oracleSql: Map[String, String] = Map(
    "q_ols_trend" ->
      """WITH dayrev AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS yq
        |  FROM orders GROUP BY 1),
        |m AS (SELECT MIN(d) AS mind FROM dayrev),
        |xy AS (SELECT CAST(date_diff('day', mind, d) AS BIGINT) AS x, yq
        |       FROM dayrev CROSS JOIN m),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |  CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*yq) AS BIGINT) AS sxy,
        |  CAST(SUM(yq) AS BIGINT) AS sy FROM xy)
        |SELECT n AS n_days,
        |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 9)
        |    AS slope_cents_per_day,
        |  round((CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 9) AS intercept_cents
        |FROM s""".stripMargin,
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS INTEGER) AS digit
        |  FROM orders),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
        |SELECT digit, COUNT(*) AS n_orders,
        |  round(CAST(COUNT(*) AS DOUBLE) / CAST(n AS DOUBLE), 9) AS observed,
        |  round(ln(CAST(digit + 1 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(10.0), 9) AS benford
        |FROM d CROSS JOIN t GROUP BY digit, n ORDER BY digit""".stripMargin,
    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS tot FROM daily),
        |x AS (
        |  SELECT d, c,
        |    CAST(SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        |  FROM daily)
        |SELECT d, c, CAST(nd * cum - rn * tot AS BIGINT) AS cusum_scaled
        |FROM x CROSS JOIN t ORDER BY d""".stripMargin,
    "q_sql_ship_lag" ->
      """WITH j AS (
        |  SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag,
        |    o_orderpriority
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT CASE WHEN lag < 0 THEN '0_early' WHEN lag <= 90 THEN '1_0-90'
        |            WHEN lag <= 365 THEN '2_91-365' ELSE '3_over365' END AS lag_bucket,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
        |    AS BIGINT) AS low_line_count
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sql_waiting_supplier" ->
      """WITH j AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
        |         THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per AS (
        |  SELECT ok, COUNT(DISTINCT sk) AS ns,
        |    COUNT(DISTINCT CASE WHEN late = 1 THEN sk END) AS nlate,
        |    MAX(CASE WHEN late = 1 THEN sk END) AS late_sk
        |  FROM j GROUP BY 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM per JOIN supplier ON late_sk = s_suppkey
        |WHERE ns >= 2 AND nlate = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_adamic_adar" ->
      s"""$linkCtes,
         |aa AS (
         |  SELECT x, y, COUNT(*) AS n_common,
         |    SUM(CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 9) AS DECIMAL(28,9))) AS scored
         |  FROM w JOIN deg USING (z) GROUP BY 1, 2)
         |SELECT x AS part_x, y AS part_y, n_common, CAST(scored AS DOUBLE) AS aa_score
         |FROM aa LEFT JOIN e ON aa.x = e.a AND aa.y = e.b
         |WHERE e.a IS NULL
         |ORDER BY aa_score DESC, part_x, part_y LIMIT 30""".stripMargin,
    "q_node_jaccard" ->
      s"""$linkCtes,
         |common AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
         |SELECT x AS part_x, y AS part_y, c AS n_common,
         |  round(CAST(c AS DOUBLE) / CAST(dx.deg + dy.deg - c AS DOUBLE), 9) AS jaccard
         |FROM common JOIN deg dx ON common.x = dx.z JOIN deg dy ON common.y = dy.z
         |ORDER BY jaccard DESC, part_x, part_y LIMIT 30""".stripMargin,
    "q_assoc_rules" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM pp),
        |freq AS (SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS n_p FROM pp GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS support
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |rules AS (
        |  SELECT pa AS ante, pb AS cons, support FROM pairs
        |  UNION ALL SELECT pb, pa, support FROM pairs)
        |SELECT ante, cons, support,
        |  round(CAST(support AS DOUBLE) / CAST(fa.n_p AS DOUBLE), 9) AS confidence,
        |  round(CAST(support AS DOUBLE) * CAST(nb AS DOUBLE)
        |    / CAST(fa.n_p * fc.n_p AS DOUBLE), 9) AS lift
        |FROM rules JOIN freq fa ON ante = fa.p JOIN freq fc ON cons = fc.p CROSS JOIN nb
        |ORDER BY lift DESC, ante, cons LIMIT 30""".stripMargin,
    "q_sorted_blocking" ->
      """WITH docs AS (
        |  SELECT doc_id, trim(lower(text)) AS nt,
        |    substr(trim(lower(text)), 1, 16) AS key,
        |    substr(trim(lower(text)), 1, 2) AS blk
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, nt,
        |    lead(doc_id, 1) OVER (PARTITION BY blk ORDER BY key, doc_id) AS b1,
        |    lead(nt, 1) OVER (PARTITION BY blk ORDER BY key, doc_id) AS t1,
        |    lead(doc_id, 2) OVER (PARTITION BY blk ORDER BY key, doc_id) AS b2,
        |    lead(nt, 2) OVER (PARTITION BY blk ORDER BY key, doc_id) AS t2
        |  FROM docs),
        |cand AS (
        |  SELECT doc_id AS da, b1 AS db, nt AS ta, t1 AS tb FROM x WHERE b1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, b2, nt, t2 FROM x WHERE b2 IS NOT NULL),
        |scored AS (
        |  SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b,
        |    round(CAST(len(list_intersect(list_distinct(string_split_regex(ta, '\s+')),
        |                                  list_distinct(string_split_regex(tb, '\s+')))) AS DOUBLE)
        |      / CAST(len(list_distinct(string_split_regex(ta, '\s+')))
        |           + len(list_distinct(string_split_regex(tb, '\s+')))
        |           - len(list_intersect(list_distinct(string_split_regex(ta, '\s+')),
        |                                list_distinct(string_split_regex(tb, '\s+')))) AS DOUBLE), 9)
        |      AS jaccard
        |  FROM cand)
        |SELECT doc_a, doc_b, jaccard FROM scored
        |WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""".stripMargin,
    "q_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM toks GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM toks),
        |d AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |    SUM(CAST(round(-ln(CAST(cw AS DOUBLE) / CAST(nt AS DOUBLE)), 9)
        |      AS DECIMAL(28,9))) AS nll
        |  FROM toks JOIN v USING (w) CROSS JOIN t GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(CAST(nll AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS avg_nll,
        |  round(exp(CAST(nll AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 6) AS ppl
        |FROM d ORDER BY doc_id""".stripMargin,
  )
}
