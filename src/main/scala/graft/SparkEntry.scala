package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.graph.PageRank
import graft.ingest.Normalize
import graft.multimodal.Media
import graft.ops.{Ordered, Profile, Reshape, Scalar}
import graft.pipeline.Marts
import graft.sim.Similarity
import graft.sources.Tables
import graft.text.{Dedup, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, implemented
  * Spark-first on the driver testdata; [[oracleSql]] carries the DuckDB
  * equivalent for the t2 hash-compare. Determinism rules (SURVEY.md §5.1):
  * every query ends in an explicit orderBy on a unique key; float aggregates
  * go through Scalar.stableSum/stableAvg (exact decimal accumulation) so
  * results are identical regardless of partitioning and match DuckDB.
  */
object SparkEntry {

  private def read(s: SparkSession, dir: String, table: String): DataFrame =
    s.read.parquet(s"$dir/$table.parquet")
  /** One sanitizer for every sf-dir-derived identifier (tmp paths, table
    * names, stream names) — table names cannot hold dots, so nothing can.
    */
  private def dirTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")
  private def tmpDir(prefix: String, dir: String): String =
    s"/tmp/graft_${prefix}_${dirTag(dir)}"

  /** Stage the events table as a file-source feed directory (file streams
    * consume DIRECTORIES): symlink the single parquet under each given
    * name — one name = one micro-batch source file; several names = an
    * at-least-once replayed feed. deleteIfExists does NOT follow links,
    * so a dangling leftover (testdata moved while /tmp persisted) is
    * replaced, not tripped over. Returns the feed path.
    */
  private def stageFeed(dir: String, prefix: String,
                        names: Seq[String] = Seq("batch0.parquet")): String = {
    import java.nio.file.{Files, Paths}
    val feed = Paths.get(tmpDir(prefix, dir))
    Files.createDirectories(feed)
    names.foreach { name =>
      val link = feed.resolve(name)
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, Paths.get(s"$dir/events.parquet"))
    }
    feed.toString
  }
  private val sa = Scalar.stableAvgSql _
  private val ss = Scalar.stableSumSql _
  private val sp = Scalar.stableSumProdSql _

  /** Cross-engine serialization of a float array: floor(x*1e6) scaled ints
    * joined with ','. float→double is exact and double arithmetic is
    * IEEE-identical across engines, so the string (unlike raw float
    * formatting, or an array column — the driver's pandas compare can't
    * sort ndarrays) is bit-stable between Spark and DuckDB. Both array
    * queries MUST share this one definition — a one-sided tweak breaks the
    * other's oracle parity.
    */
  private def serializeFloats(c: Column): Column =
    array_join(transform(c,
      x => floor(x.cast("double") * 1e6).cast("long").cast("string")), ",")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.martAssembly(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // §2.1 scans / sources / sinks
  // =====================================================================

  /** S1 CSV scan (reference get_csv, src/ETL-NPL-Pipeline.py:34-40):
    * parquet->CSV round-trip of `region`, read back with explicit schema.
    */
  private def qScanCsv(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("scan_csv", dir)
    read(s, dir, "region").coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(tmp)
    Normalize.readCsv(s, tmp, StructType.fromDDL("r_regionkey INT, r_name STRING"))
      .orderBy("r_regionkey")
  }

  /** S2 Excel scan DECLARED (reference pd.read_excel, src:48-54,513):
    * region → .xlsx (inline-string workbook written by the library's own
    * minimal OPC writer) → Xlsx sheet reader → header promoted → typed
    * columns. The collect() is 5 ingest-sized rows — the same sanctioned
    * exception as the hostile-CSV header handling (SURVEY §7.4.1).
    */
  private def qScanXlsx(s: SparkSession, dir: String): DataFrame = {
    val path = s"${tmpDir("scan_xlsx", dir)}.xlsx"
    val rows = read(s, dir, "region").orderBy("r_regionkey")
      .select(col("r_regionkey").cast("string"), col("r_name"))
      .collect().map(r => Seq(r.getString(0), r.getString(1))).toSeq
    graft.sources.Xlsx.writeSheet(path, Seq("r_regionkey", "r_name") +: rows)
    graft.sources.Xlsx.readSheetDf(s, path)
      .filter(col("_idx") > 0) // drop the header row
      .select(col("_c0").cast("int").as("r_regionkey"), col("_c1").as("r_name"))
      .orderBy("r_regionkey")
  }

  /** S3/S5 JSON records -> table (observations_bot + json_normalize,
    * src:78-112,218): parse the `events.props` JSON column with an explicit
    * schema (never infer on a 100 TB scan).
    */
  private def qJsonRecords(s: SparkSession, dir: String): DataFrame =
    Normalize.jsonRecords(
        Tables.events(s, dir).select(col("event_id"), col("props")),
        col("props"), StructType.fromDDL("k INT"))
      .select("event_id", "k").orderBy("event_id")

  /** S4/O3 month-paginated fetch + batch accumulation (interest_bot,
    * src:271-327): union of day-range slices reassembles the whole table.
    */
  private def qUnionBatches(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Seq((1, 10), (11, 20), (21, 31))
      .map { case (a, b) => ev.filter(dayofmonth(col("ts")).between(a, b)) }
      .reduce(_.unionByName(_))
      .orderBy("event_id")
  }

  /** S6 timestamped CSV sink (src:769-793): aggregate -> header CSV ->
    * re-read with schema; count/values preserved.
    */
  private def qSinkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("sink", dir)
    read(s, dir, "orders").groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    Normalize.readCsv(s, tmp, StructType.fromDDL("o_orderpriority STRING, n_orders BIGINT"))
      .orderBy("o_orderpriority")
  }

  /** S6 scale path: partitioned-parquet sink round-trip. Writes per-quarter
    * aggregates partitioned by l_returnflag, re-reads with a partition
    * filter — the read scans only the `l_returnflag=A/` directory
    * (partition pruning), which is the 100 TB layout for segment marts.
    */
  private def qSinkPartitioned(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("sink_part", dir)
    val agg = read(s, dir, "lineitem")
      .groupBy(Scalar.toQuarter(col("l_shipdate")).as("Quarter"), col("l_returnflag"))
      .agg(Scalar.stableSum(col("l_quantity")).as("sum_qty"))
    graft.pipeline.Sink.writePartitioned(agg, tmp, "l_returnflag")
    graft.pipeline.Sink.readPartitioned(s, tmp)
      .filter(col("l_returnflag") === "A")
      .select("Quarter", "l_returnflag", "sum_qty")
      .orderBy("Quarter")
  }

  // =====================================================================
  // §2.2 projections / filters / predicates
  // =====================================================================

  /** P1/P2 projection by name and by position (src:251,365). */
  private def qProject(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val c = li.columns
    li.select(col(c(0)), col(c(3)), col(c(4))) // positional: orderkey, linenumber, quantity
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P3 column drop (src:189). */
  private def qDropCol(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part").drop("p_retailprice", "p_size").orderBy("p_partkey")

  /** P5 equality predicate (src:426 `query("name_eng != ...")`). */
  private def qFilterEq(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "customer").filter(col("c_mktsegment") =!= "BUILDING")
      .orderBy("c_custkey")

  /** P6 substring predicate (src:180-186 `.str.contains`). */
  private def qFilterContains(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part").filter(col("p_name").contains("red")).orderBy("p_partkey")

  /** P7 string-length predicate (src:407 drop 4-char year rows). */
  private def qFilterStrlen(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "nation").filter(length(col("n_name")) =!= 4).orderBy("n_nationkey")

  /** P8 positional row slice (src:125-126 `iloc[[4,5,16,17,18], ...]`):
    * explicit ordinal + isin/range — pandas row positions on an unordered
    * engine (SURVEY.md §7.4.1).
    */
  private def qRowsByOrdinal(s: SparkSession, dir: String): DataFrame =
    Normalize.withOrdinal(
        read(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        col("o_orderkey"))
      .filter(col("_idx").isin(5, 6, 17, 18, 19) || col("_idx").between(100, 120))
      .orderBy("_idx")

  // =====================================================================
  // §2.3 joins
  // =====================================================================

  /** J1 chained inner equi-joins (src:241-242). At testdata scale AQE
    * broadcasts orders/customer; at 100 TB they become shuffle joins on the
    * join keys — no hints needed, Catalyst decides.
    */
  private def qJoinInner(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    val o = read(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val c = read(s, dir, "customer").select("c_custkey", "c_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice", "c_name")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J2 chained full-outer joins on Quarter (src:706-708), key coalesced by
    * usingColumns like pandas `merge(on=)`.
    */
  private def qJoinFullOuter(s: SparkSession, dir: String): DataFrame =
    Marts.commonSeries(s, dir).orderBy("Quarter")

  /** As-of join (beyond the reference: panel-data "latest value at or
    * before t"): every event joined to its user's most recent purchase.
    * Spark side composes union + keyed ffill window (ops.AsOf — one
    * shuffle); the oracle cross-validates against DuckDB's native
    * ASOF LEFT JOIN.
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // Dedupe the right side to one row per (user_id, ts) BEFORE the as-of:
    // with ties present, Spark's window fill and DuckDB's ASOF each pick an
    // arbitrary row and the hash-compare goes flaky (ADVICE r1). max(value)
    // is the deterministic representative on both engines.
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("last_purchase_value"))
    graft.ops.AsOf.joinLastBefore(
        ev.select("event_id", "user_id", "ts", "event_type", "value"),
        purchases, keys = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("last_purchase_value"))
      .select("event_id", "user_id", "event_type", "value", "last_purchase_value")
      .orderBy("event_id")
  }

  // =====================================================================
  // §2.4 reshape
  // =====================================================================

  /** R1 wide->long unpivot (pandas stack, src:149-160). */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = read(s, dir, "orders")
      .groupBy(Scalar.toQuarter(col("o_orderdate")).as("Quarter"))
      .agg(
        Scalar.stableAvg(col("o_totalprice")).as("avg_price"),
        Scalar.stableSum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_orders"))
    Reshape.unpivotWide(wide, Seq("Quarter"),
        Seq("avg_price", "sum_price", "n_orders"), "metric", "value")
      .orderBy("Quarter", "metric")
  }

  /** R2 long->wide pivot (src:163-165) with explicit pivot values — no
    * discovery scan (Reshape scale note).
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    Reshape.pivotLong(
        read(s, dir, "lineitem").select(
          Scalar.toQuarter(col("l_shipdate")).as("Quarter"),
          col("l_returnflag"), col("l_quantity")),
        Seq("Quarter"), "l_returnflag", Seq("A", "N", "R"),
        Scalar.stableSum(col("l_quantity")))
      .orderBy("Quarter")

  /** SQL surface: the engine's full Spark SQL dialect over registered
    * views — capability the reference lacks entirely (it has no query
    * language, SURVEY.md §3) but that falls out of riding Catalyst. TPC-H
    * Q1 shape with decimal-stable aggregates.
    */
  private def qSqlPricingSummary(s: SparkSession, dir: String): DataFrame = {
    read(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  // =====================================================================
  // §2.5 aggregation
  // =====================================================================

  /** A1/A2 group-by mean to quarterly (src:353,441). */
  private def qGroupbyAvg(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .groupBy(Scalar.toQuarter(col("o_orderdate")).as("Quarter"))
      .agg(
        Scalar.stableAvg(col("o_totalprice")).as("avg_price"),
        count(col("o_orderkey")).as("n_orders"))
      .orderBy("Quarter")

  /** Grouped top-k via ranking window. Catalyst's WindowGroupLimit rewrite
    * keeps only k rows per group on the map side before the shuffle — the
    * scalable form of "top N per key" without a custom operator.
    */
  private def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("value"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("user_id", "rn")
  }

  /** Exact distinct counts per quarter (Spark plans partial distinct
    * aggregation; the approximate path is approx_count_distinct, not
    * oracle-comparable across engines).
    */
  private def qDistinctCount(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .groupBy(Scalar.toQuarter(col("l_shipdate")).as("Quarter"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("Quarter")

  /** Sketch aggregate: HyperLogLog++ approximate distinct next to the
    * exact count (rows-only: sketch estimates are engine-specific). At
    * 100 TB the exact distinct needs a full shuffle of the keys; the
    * sketch is constant-size per group and map-side combinable.
    */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .groupBy(Scalar.toQuarter(col("l_shipdate")).as("Quarter"))
      .agg(countDistinct(col("l_suppkey")).as("exact_suppliers"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_suppliers"))
      .orderBy("Quarter")

  /** Order statistics: exact interpolated percentiles per quarter (both
    * engines use the same lower+(upper-lower)*frac interpolation).
    */
  private def qQuantiles(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .groupBy(Scalar.toQuarter(col("o_orderdate")).as("Quarter"))
      // one exact-percentile aggregate (array of fractions) instead of two:
      // the value buffer is built and sorted once per group
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("_p"))
      .select(col("Quarter"), col("_p").getItem(0).as("p50"),
        col("_p").getItem(1).as("p90"))
      .orderBy("Quarter")

  // =====================================================================
  // §2.6 scalar functions
  // =====================================================================

  /** F1 quarter-format swap (reformat_quarter, src:63-67) — pure regex. */
  private def qStrQswap(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .select(concat(lit("Q"), quarter(col("o_orderdate")).cast("string"),
        lit("/"), year(col("o_orderdate")).cast("string")).as("raw"))
      .distinct()
      .withColumn("swapped", Scalar.quarterSwap(col("raw")))
      .orderBy("swapped")

  /** F2/F3 revision-marker strip + trim (src:134,385). */
  private def qRegexStrip(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part")
      .select(col("p_partkey"),
        concat(col("p_brand"),
          when(col("p_size") % 2 === 0, lit(" p")).otherwise(lit(" r1"))).as("raw"))
      .withColumn("clean", Scalar.stripRevision(col("raw")))
      .orderBy("p_partkey")

  /** F4/F11 de-comma numeric parse (src:173 `"106,371" -> 106371`). */
  private def qParseNumber(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders").filter(col("o_orderkey") >= 1000)
      .select(col("o_orderkey"),
        concat(expr("o_orderkey div 1000").cast("string"), lit(","),
          lpad((col("o_orderkey") % 1000).cast("string"), 3, "0")).as("fmt"))
      .withColumn("parsed", Scalar.deComma(col("fmt")))
      .orderBy("o_orderkey")

  /** F5 percent string -> ratio (src:169 etc.). */
  private def qPctRatio(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("string").as("pct_str"))
      .withColumn("ratio", Scalar.pctToRatio(col("pct_str")))
      .orderBy("p_partkey")

  /** F6 derived ratio columns (src:176,245,248). */
  private def qDerivedRatio(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_rev"),
        (col("l_extendedprice") / (lit(1.0) + col("l_tax"))).as("pre_tax"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F7 formatted date parse (src:344 `%d/%m/%y`; 4-digit year for
    * century-pivot parity with the oracle).
    */
  private def qDateParse(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .select(date_format(col("o_orderdate"), "d/M/yyyy").as("raw")).distinct()
      .withColumn("parsed", to_date(col("raw"), "d/M/yyyy"))
      .orderBy("parsed")

  /** F8 date -> quarter key (src:350,438). */
  private def qToQuarter(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .select(Scalar.toQuarter(col("l_shipdate")).as("Quarter"),
        date_trunc("quarter", col("l_shipdate")).cast("date").as("q_start"))
      .distinct().orderBy("Quarter")

  /** F9/F10 date arithmetic + formatting (src:298,302-303,323): month window
    * end = start + 1 month - 1 day; cursor advance = end + 1 day.
    */
  private def qDateArith(s: SparkSession, dir: String): DataFrame = {
    // Distinct FIRST on the truncated month (one narrow date column, ~100
    // distinct values), then derive/format — formatting before distinct
    // would run 3 formatter calls per input row instead of per month.
    val months = read(s, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).as("m")).distinct()
    val end = date_sub(add_months(col("m"), 1), 1)
    months
      .select(date_format(col("m"), "yyyy-MM-dd").as("month_start"),
        date_format(end, "yyyy-MM-dd").as("month_end"),
        date_format(date_add(end, 1), "yyyy-MM-dd").as("next_start"))
      .orderBy("month_start")
  }

  /** Set operations (beyond the reference's lone union): INTERSECT/EXCEPT
    * with SQL distinct semantics, tagged into one result.
    */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = read(s, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    building.intersect(rich).withColumn("op", lit("both"))
      .unionByName(building.except(rich).withColumn("op", lit("building_only")))
      .orderBy("op", "c_custkey")
  }

  /** Rollup totals (hierarchical grouping sets — free from Catalyst). */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .rollup(Scalar.toQuarter(col("l_shipdate")).as("Quarter"), col("l_returnflag"))
      .agg(Scalar.stableSum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("Quarter"), asc_nulls_first("l_returnflag"))

  /** Cube grouping sets: all (quarter-year, priority) margin combinations
    * in one pass (free from Catalyst's Expand).
    */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .cube(year(col("o_orderdate")).cast("int").as("yr"), col("o_orderpriority"))
      .agg(Scalar.stableSum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("yr"), asc_nulls_first("o_orderpriority"))

  /** Array scalar functions over the embedding column (size / slice /
    * transform / element access / fold) — the multimodal column vocabulary
    * (X4). The sliced head is serialized as floor(x*1e6) ints joined with
    * ',': float→double is exact and double arithmetic is IEEE-identical
    * across engines, so the string (unlike raw float formatting, or an
    * array column — the driver's pandas compare can't sort ndarrays) is
    * bit-stable between Spark and DuckDB.
    */
  private def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        serializeFloats(slice(col("embedding"), 1, 8)).as("head8"),
        element_at(col("embedding"), 1).cast("double").as("first_dim"))
      .orderBy("vec_id")

  /** Null handling over outer-join gaps (coalesce / nullif / CASE / IS
    * NULL) — the reference leaves NaNs untouched; an engine needs the
    * vocabulary.
    */
  private def qNullHandling(s: SparkSession, dir: String): DataFrame =
    Marts.commonSeries(s, dir).select(
        col("Quarter"),
        coalesce(col("avg_price"), lit(0.0)).as("price_filled"),
        col("avg_qty").isNull.as("qty_missing"),
        expr("nullif(n_urgent, 0)").as("urgent_or_null"),
        when(col("r_revenue") > 0, lit("has_returns")).otherwise(lit("none")).as("returns_flag"))
      .orderBy("Quarter")

  // =====================================================================
  // §2.7 ordered / stateful
  // =====================================================================

  /** Analytic window functions (lag/lead/cumulative) per user over event
    * time — absent from the reference, table stakes for an engine. The
    * running sum accumulates in DECIMAL: DuckDB evaluates window aggregates
    * over a segment tree whose combine order differs from a left fold, so
    * only an associative-exact accumulator is cross-engine stable.
    */
  private def qWindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("running_value",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization (native session_window, batch path; the
    * streaming path shares the expression — streaming.EventStreams).
    * Oracle: classic gaps-and-islands over lag + running flag sum. A new
    * session starts when the gap is >= 5 minutes (session_window's end is
    * exclusive: ts + gap).
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.sessionWindowAgg(
        Tables.events(s, dir).select("user_id", "ts", "value"), "5 minutes")
      .orderBy("user_id", "session_start")

  /** O1 forward-fill within a partition (src:131). */
  private def qFfill(s: SparkSession, dir: String): DataFrame = {
    val v = when(col("event_type") === "click", col("value"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), v.as("v"))
      .withColumn("filled",
        Ordered.ffill(col("v"), Seq(col("user_id")), Seq(col("event_id"))))
      .orderBy("event_id")
  }

  /** O2 stateful year fill-down (src:388-404): 4-char rows set the running
    * year, quarter rows inherit it — the GDP-sheet pathology on an ordinal.
    */
  private def qFillDown(s: SparkSession, dir: String): DataFrame = {
    val qs = read(s, dir, "orders")
      .select(year(col("o_orderdate")).cast("string").as("y"),
        quarter(col("o_orderdate")).cast("string").as("q"))
      .distinct()
    val labeled = qs.select(
      when(col("q") === "1", col("y")).otherwise(concat(lit("Q"), col("q"))).as("label"),
      col("y"), col("q"))
    Normalize.withOrdinal(labeled, col("y"), col("q"))
      .withColumn("year_filled", Ordered.carryYear(col("label"), Seq(col("_idx"))))
      .withColumn("quarter_key",
        when(length(col("label")) =!= 4,
          concat(col("year_filled"), lit("-"), col("label"))))
      .select("_idx", "label", "year_filled", "quarter_key")
      .orderBy("_idx")
  }

  // =====================================================================
  // §2.9 north-star: dedup / similarity / text analysis / multimodal
  // =====================================================================

  /** X1 exact dedup — lowest doc_id per (lang, source). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(read(s, dir, "documents"), Seq("lang", "source"), "doc_id")
      .select("doc_id", "lang", "source").orderBy("doc_id")

  /** X1 n-gram Jaccard near-dup pairs: inverted-index join over
    * stop-shingle-filtered sets (df <= Dedup.DefaultMaxShingleDf; hot
    * shingles carry no dedup signal but drive the join quadratically —
    * the cap bounds candidates to O(cap · corpus)). Oracle mirrors the
    * filter, so the exact filtered-set Jaccard values hash-match.
    */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(read(s, dir, "documents"), n = 3, threshold = 0.1)
      .orderBy("doc_a", "doc_b")

  /** X1 prefix-filtering similarity join (SSJoin/AllPairs family) — the
    * exact, no-recall-loss alternative to q_ngram_jaccard's stop-shingle
    * cap: docs are indexed only by their rarest-first shingle prefixes, so
    * frequent shingles never generate candidates (Dedup.jaccardPrefixPairs
    * for the bound). Threshold 2/5 kept rational so the prefix arithmetic
    * is integer on both engines.
    */
  private def qJaccardPrefix(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPrefixPairs(read(s, dir, "documents"), n = 3,
        thresholdNum = 2, thresholdDen = 5)
      .orderBy("doc_a", "doc_b")

  /** X1 near-containment pairs (overlap coefficient ≥ 0.9): catches the
    * doc-subsumption case Jaccard misses — a short doc quoted inside a
    * long one (tiny union-relative overlap, near-total min-relative
    * overlap). Same capped inverted-index pipeline as q_ngram_jaccard
    * (Dedup.containmentPairs).
    */
  private def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(read(s, dir, "documents"), n = 3, threshold = 0.9)
      .orderBy("doc_a", "doc_b")

  /** X1 MinHash+LSH banding with exact-Jaccard verification — the
    * portable-hash-family variant, so signature minima, band keys,
    * candidate join, and verification all hash-match a DuckDB oracle; the
    * xxhash64 MinHashAgg path remains the library's production variant.
    */
  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairsPortable(read(s, dir, "documents"), n = 3,
        numHashes = 16, bands = 4, verifyThreshold = 0.5)
      .orderBy("doc_a", "doc_b")

  /** X1 ingest-time incremental dedup: docs with doc_id ≡ 4 (mod 5) play
    * the arriving batch; the rest are the standing corpus whose band-
    * signature index is materialized ONCE per testdata generation (mtime
    * stamp) and probed by every later run — arrivals are signed and
    * verified without re-signing the corpus, the shape that keeps
    * per-batch dedup cost at |batch| + |candidates| on a 100 TB corpus.
    * Signatures are per-doc functions, so the result equals the full
    * corpus LSH restricted to new-vs-corpus pairs — which is exactly what
    * the oracle (and a DedupSpec property) asserts.
    */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val isNew = pmod(col("doc_id"), lit(5L)) === 4L
    val idx = bandIndexPath(dir)
    Dedup.ensureBandIndex(docs.filter(!isNew), idx, n = 3, numHashes = 16, bands = 4)
    Dedup.incrementalLshPairs(docs, isNew, idx, n = 3, numHashes = 16,
        bands = 4, verifyThreshold = 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** X1 the CLOSED ingest-dedup loop across TWO batches: the base index
    * covers docs ≡ 0,1,2 (mod 5); batch 1 (≡ 3) probes it AND appends
    * its own signatures as a `batch=b1` index partition; batch 2 (≡ 4)
    * then probes the GROWN index — its near-dups against batch 1 come
    * through the index alone, with no corpus re-sign between batches.
    * Signatures are per-doc functions, so the final probe still equals
    * full-corpus LSH restricted to batch-2-vs-rest — the identical
    * oracle restriction as q_dedup_incremental, now witnessed through
    * the grown artifact. Idempotent across runs: the batch partition's
    * own _SUCCESS skips the re-append, and the probe prunes a replayed
    * batch's partition out of its index read.
    */
  private def qDedupMultibatch(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val m = pmod(col("doc_id"), lit(5L))
    val stamp = new java.io.File(s"$dir/documents.parquet").lastModified()
    val idx = s"${tmpDir("band_index_mb", dir)}_n3h16b4_$stamp"
    Dedup.ensureBandIndex(docs.filter(m < 3), idx, n = 3, numHashes = 16, bands = 4)
    Dedup.ingestPairs(docs.filter(m =!= 4L), m === 3L, idx, n = 3,
      numHashes = 16, bands = 4, verifyThreshold = 0.5, appendBatch = Some("b1"))
    Dedup.incrementalLshPairs(docs, m === 4L, idx, n = 3, numHashes = 16,
        bands = 4, verifyThreshold = 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** X1 the ingest-dedup loop run as a STREAM (graft.streaming.IngestDedup):
    * the base corpus (doc_id ≡ 0,1,2 mod 5) bootstraps the doc store, band
    * index, and label version b000000000; the two remaining fifths arrive
    * as one-file micro-batches through a file feed. Each foreachBatch
    * lands the arrivals, probes + grows the index, folds the pairs into a
    * NEW committed label version. CC associativity makes the final labels
    * equal the full-corpus LSH recompute, so the oracle is the same SQL as
    * q_groups_incremental — now witnessing the whole streaming loop,
    * including its exactly-once version commits (warm re-runs skip every
    * committed batch and just read the latest labels).
    */
  private def qIngestStream(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val m = pmod(col("doc_id"), lit(5L))
    val stamp = new java.io.File(s"$dir/documents.parquet").lastModified()
    val root = s"${tmpDir("ingest_loop", dir)}_n3h16b4_$stamp"
    val p = graft.streaming.IngestDedup.Params(
      n = 3, numHashes = 16, bands = 4, verifyThreshold = 0.5)
    graft.streaming.IngestDedup.ensureIngestState(
      docs.filter(m < 3).select("doc_id", "text"),
      s"$root/docs", s"$root/idx", s"$root/labels", p)
    // stage the two arrival batches as one feed file each, once (the
    // marker is underscore-hidden, so the file source never reads it)
    val feedDir = new java.io.File(s"$root/feed")
    val staged = new java.io.File(feedDir, "_graft_staged")
    if (!staged.exists()) {
      docs.filter(m === 3L).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      docs.filter(m === 4L).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      staged.createNewFile()
    }
    val stream = s.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1) // one feed file = one micro-batch
      .parquet(feedDir.toString)
    graft.streaming.IngestDedup.runAvailable(stream, s"$root/docs",
      s"$root/idx", s"$root/labels", s"$root/ckpt", p).awaitTermination()
    graft.streaming.IngestDedup.labels(s, s"$root/labels")
      .select(col("id").as("doc_id"), col("group_id"))
      .orderBy("doc_id")
  }

  /** Stamped artifact paths for the ingest-dedup loop: keyed by testdata
    * mtime AND every LSH parameter baked into the artifact's CONTENT —
    * a parameter change must miss the cache and rebuild, not silently
    * probe 32-hash signatures against a 16-hash index.
    */
  private def bandIndexPath(dir: String): String = {
    val stamp = new java.io.File(s"$dir/documents.parquet").lastModified()
    s"${tmpDir("band_index", dir)}_n3h16b4_$stamp"
  }
  private def priorLabelsPath(dir: String): String = {
    val stamp = new java.io.File(s"$dir/documents.parquet").lastModified()
    s"${tmpDir("prior_labels", dir)}_n3h16b4t50_$stamp"
  }

  /** X1 the full ingest-time dedup loop: prior GROUP LABELS (corpus CC,
    * materialized once per testdata generation, like the band index) are
    * folded together with the arriving batch's pairs — index-probe mixed
    * pairs plus the batch's internal pairs — through incremental CC,
    * which relabels only the touched components (reconstructed from
    * their label stars) and passes every other row through unchanged.
    * Because CC is associative over edge union and signatures are
    * per-doc, the merged labels equal corpus-CC over the FULL pair graph
    * — which is exactly what the oracle recomputes from scratch.
    */
  private def qGroupsIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val isNew = pmod(col("doc_id"), lit(5L)) === 4L
    val idxPath = bandIndexPath(dir) // shared with q_dedup_incremental
    val corpus = docs.filter(!isNew)
    Dedup.ensureBandIndex(corpus, idxPath, n = 3, numHashes = 16, bands = 4)
    Dedup.ensureGroupLabels(corpus, priorLabelsPath(dir), n = 3, numHashes = 16,
      bands = 4, verifyThreshold = 0.5)
    // ONE batch pass: index-probe (mixed) + in-batch pairs share the
    // same shingling, banding, and verify (Dedup.ingestPairs)
    val batchPairs = Dedup.ingestPairs(docs, isNew, idxPath, n = 3,
      numHashes = 16, bands = 4, verifyThreshold = 0.5)
    val merged = Dedup.incrementalGroups(
      s.read.parquet(priorLabelsPath(dir)),
      batchPairs.select("doc_a", "doc_b"))
    // batch singletons (no pair anywhere) label themselves
    docs.select(col("doc_id"))
      .join(merged.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("group_id"), col("doc_id")).as("group_id"))
      .orderBy("doc_id")
  }

  /** X1 SimHash near-dup pairs, banded Hamming join — the 56-bit portable
    * variant so the whole pipeline (per-token hash, bit votes, banding,
    * Hamming verify) is DuckDB-oracle-checked; the 64-bit xxhash64 variant
    * stays the library's production path (DedupSpec).
    */
  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsPortable(read(s, dir, "documents"), maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  /** X2 exact top-k cosine against vec 0 (codegen'd CosineSim kernel). */
  private def qTopkCosine(s: SparkSession, dir: String): DataFrame =
    Similarity.topkCosine(s, read(s, dir, "embeddings"), queryId = 0L, k = 10)

  /** X1/X2 embedding near-dup pairs: sign-LSH band candidates (equi-join
    * on (band, bucket) — no n² product in the plan) + exact cosine verify.
    * Portable planes let the oracle regenerate the identical bucketing, so
    * candidates AND verified sims hash-match; the all-pairs exact baseline
    * is spec-only (SimilaritySpec proves the banded pair set equals it on
    * this testdata).
    */
  private def qDedupEmbed(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsBanded(s, read(s, dir, "embeddings"), threshold = 0.4)
      .orderBy("vec_a", "vec_b")

  /** X1×X2 end-to-end embedding dedup: banded near-dup pairs fed through
    * connected components — every vector labeled with the minimum vec_id
    * reachable through the cosine-similarity graph, the keep-one-per-
    * cluster step for embedding-level dedup. Oracle: the same banded
    * candidate SQL plus a recursive-CTE transitive closure.
    */
  private def qDedupEmbedGroups(s: SparkSession, dir: String): DataFrame = {
    val emb = read(s, dir, "embeddings")
    val pairs = Similarity.nearDupPairsBanded(s, emb, threshold = 0.4)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    Dedup.dedupGroups(emb.select("vec_id"), pairs, "vec_id").orderBy("vec_id")
  }

  /** X2 ANN top-k via sign-LSH buckets + exact re-rank. Hash-derived
    * hyperplanes (Similarity.portablePlanes) replace the seeded RNG so the
    * oracle can regenerate identical planes in SQL — bucketing, candidate
    * overlap, and cosine re-rank are all cross-engine-checked.
    */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopk(s, read(s, dir, "embeddings"), queryId = 0L, k = 10,
      planes = Similarity.portablePlanes(16, 64))

  /** X2 IVF ANN: inverted lists + nprobe probing, on the ONE clustering
    * code path (Similarity.ivfTopkFixed — exact BIGINT Lloyd, so the
    * quantizer refinement is oracle-replayable and the old float-path
    * iters=0 restriction is gone; round-5 verdict consolidation).
    * Config differs from q_ivf_refined on refinement depth and probe
    * width (iters=1, nprobe=3 vs 2/2), so the two queries hash-check
    * distinct operating points of the same implementation.
    */
  private def qIvfTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopkFixed(s, read(s, dir, "embeddings"), queryId = 0L,
      kNeighbors = 10, clusters = 8, nprobe = 3, iters = 1)

  /** X2 Lloyd-REFINED k-means through the correctness gate — closes the
    * round-4 "Lloyd refinement is spec-only" gap. Fixed-point BIGINT
    * arithmetic end-to-end (Similarity.kmeansFixed): quantize-and-shift
    * per dimension, squared-L2 assignment, integer-mean update — every
    * step bit-identical in the oracle's unrolled 2-iteration SQL replay,
    * the PageRank playbook applied to clustering. k=8, iters=2.
    */
  private def qKmeansLloyd(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansFixed(read(s, dir, "embeddings"), k = 8, iters = 2)
      .orderBy("vec_id")

  /** X2 IVF top-k over the REFINED fixed-point centroids — q_ivf_topk's
    * iters=0 restriction lifted: because the quantizer is exact integer
    * arithmetic (Similarity.kmeansFixedFull), membership, probe choice,
    * and the cosine re-rank are all replayed by the oracle, so the
    * complete refined-IVF path is hash-checked, not just spec'd.
    */
  private def qIvfRefined(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopkFixed(s, read(s, dir, "embeddings"), queryId = 0L,
      kNeighbors = 10, clusters = 8, nprobe = 2, iters = 2)

  /** X2 incremental IVF ingest: vectors ≡ 4 (mod 5) play the arriving
    * batch; the rest are the standing corpus whose REFINED centroid
    * index is materialized once per testdata generation (stamped path,
    * _SUCCESS-idempotent — the same convention as the dedup band index)
    * and every batch assigns against the stored k·dim table at
    * |batch|·k·dim cost, never re-clustering the corpus. Exact integer
    * centroids make the store-probe-replay chain oracle-checkable
    * end-to-end — the similarity-side mirror of q_dedup_incremental.
    */
  private def qIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val emb = read(s, dir, "embeddings")
    val isNew = pmod(col("vec_id"), lit(5L)) === 4L
    val stamp = new java.io.File(s"$dir/embeddings.parquet").lastModified()
    val idx = s"${tmpDir("centroid_index", dir)}_k8i2_$stamp"
    Similarity.ensureCentroidIndex(emb.filter(!isNew), idx, k = 8, iters = 2)
    Similarity.assignToCentroidIndex(s, emb.filter(isNew), idx)
      .orderBy("vec_id")
  }

  /** X2 the IVF ingest loop run as a STREAM (graft.streaming.IngestIvf):
    * the corpus 3/5 bootstraps the refined centroid index; the two
    * remaining fifths arrive as one-file micro-batches and each
    * foreachBatch assigns them against the STORED centroids, landing
    * `_SUCCESS`-guarded batch partitions. Assignments are per-vector
    * functions of exact integer centroids, so the streamed result equals
    * the batch replay — the oracle runs the Lloyd chain over the corpus
    * and assigns the arrived fifths, hash-matching the loop's committed
    * store. Warm re-runs skip every committed batch and just read.
    */
  private def qStreamIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = read(s, dir, "embeddings")
    val m = pmod(col("vec_id"), lit(5L))
    val stamp = new java.io.File(s"$dir/embeddings.parquet").lastModified()
    val root = s"${tmpDir("ivf_loop", dir)}_k8i2_$stamp"
    graft.streaming.IngestIvf.ensureIvfState(
      emb.filter(m < 3), s"$root/idx", k = 8, iters = 2)
    val feedDir = new java.io.File(s"$root/feed")
    val staged = new java.io.File(feedDir, "_graft_staged")
    if (!staged.exists()) {
      emb.filter(m === 3L).select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      emb.filter(m === 4L).select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      staged.createNewFile()
    }
    val stream = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1) // one feed file = one micro-batch
      .parquet(feedDir.toString)
    graft.streaming.IngestIvf.runAvailable(stream, s"$root/idx",
      s"$root/assigns", s"$root/ckpt").awaitTermination()
    graft.streaming.IngestIvf.assignments(s, s"$root/assigns")
      .select("vec_id", "cluster", "dist")
      .orderBy("vec_id")
  }

  /** X2 streaming MINI-BATCH k-means (streaming/StreamKmeans): centroids
    * EVOLVE as shards arrive — each micro-batch assigns to the current
    * centroids and folds its integer sufficient statistics (ssum, n) in,
    * Sculley's web-scale mini-batch update in exact BIGINT so every
    * version of the evolving state is bit-replayable. Corpus 3/5
    * bootstraps via the Lloyd builder; the two remaining fifths arrive
    * as one-file micro-batches; output = the final centroids
    * (cluster, pos, c, n), hash-matched by an oracle that unrolls
    * bootstrap + both updates.
    */
  private def qStreamKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = read(s, dir, "embeddings")
    val m = pmod(col("vec_id"), lit(5L))
    val stamp = new java.io.File(s"$dir/embeddings.parquet").lastModified()
    val root = s"${tmpDir("kmeans_loop", dir)}_k8i2_$stamp"
    graft.streaming.StreamKmeans.ensureKmeansState(
      emb.filter(m < 3), s"$root/stats", k = 8, iters = 2)
    val feedDir = new java.io.File(s"$root/feed")
    val staged = new java.io.File(feedDir, "_graft_staged")
    if (!staged.exists()) {
      // Pin STRICTLY SPACED mtimes on the two feed writes: centroids
      // EVOLVE per batch, so micro-batch order is part of this query's
      // semantics — and FileStreamSource orders its maxFilesPerTrigger=1
      // batches by file modification time, which has millisecond
      // granularity. Two back-to-back coalesce(1) writes can land with
      // EQUAL mtimes, letting the m=4 fifth process before m=3 and
      // breaking the oracle's fixed k1/k2 unroll nondeterministically.
      // The part filenames are writer UUIDs, so WHICH file holds which
      // fifth is recorded by diffing the listing between the writes.
      def parts = feedDir.listFiles().filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
          && !f.getName.startsWith(".")).toSeq
      emb.filter(m === 3L).select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      val firstWrite = parts.map(_.getName).toSet
      emb.filter(m === 4L).select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(feedDir.toString)
      val base = System.currentTimeMillis()
      parts.foreach { f =>
        f.setLastModified(if (firstWrite(f.getName)) base - 8000 else base - 4000)
      }
      staged.createNewFile()
    }
    val stream = s.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir.toString)
    graft.streaming.StreamKmeans.runAvailable(stream, s"$root/stats",
      s"$root/ckpt").awaitTermination()
    graft.streaming.StreamKmeans.centroids(s, s"$root/stats")
      .orderBy("cluster", "pos")
  }

  /** X1×X2 SemDeDup: cluster-scoped semantic dedup (Abbas et al. 2023) —
    * the quantizer bounds the comparison space (no banding, no recall
    * curve), and within each cluster the paper's upper-triangle drop rule
    * keeps the farthest-from-centroid representative of every near-dup
    * neighborhood. iters=0 pins the quantizer to its deterministic init
    * so assignment, centroid sims, and the drop rule are all
    * SQL-expressible — fully oracle-checked; the Lloyd-refined library
    * configuration (iters>0, via the one fixed-point Lloyd path) is
    * covered by SimilaritySpec's drop-rule contract.
    */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(s, read(s, dir, "embeddings"), clusters = 8,
      threshold = 0.4).orderBy("vec_id")

  /** X2/X4 embedding statistics: per-label mean L2 norm. Norms via
    * explode + exact decimal sum of squares (order-independent), then a
    * second decimal-stable mean over the per-vector norms — nested exact
    * aggregation, reproducible bit-for-bit in the oracle.
    */
  private def qEmbedNorms(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 20)
    val norms = read(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xd", col("x").cast("double"))
      .groupBy("vec_id", "label")
      .agg(sqrt(sum((col("xd") * col("xd")).cast(dec)).cast("double")).as("norm"))
    norms.groupBy("label")
      .agg(Scalar.stableAvg(col("norm")).as("avg_norm"), count(lit(1)).as("n"))
      .orderBy("label")
  }

  /** X3 token counting: whitespace tokens + BPE-ish regex tokens. */
  private def qTokenCount(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_obs"))
      .orderBy("doc_id")

  /** X3 order-sensitive rolling-hash fingerprint — the portable-hash
    * variant (char-polynomial per token, base-1000003 fold over the token
    * sequence), replicable in DuckDB via nested list_reduce, so it gets a
    * real oracle; TextOps.rollingHash (xxhash64) remains the library path.
    */
  private def qRollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHash.register(s)
    read(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.portableRollingHashFast(TextOps.tokens(col("text"))).as("rolling_fp"))
      .orderBy("doc_id")
  }

  /** X3 language-ID heuristic: stopword-hit ratio per doc. */
  private def qLangId(s: SparkSession, dir: String): DataFrame = {
    val tok = read(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
    tok.groupBy("doc_id", "lang")
      .agg((count(when(col("w").isin(TextOps.EnStopwords: _*), 1)).cast("double") /
        count(lit(1))).as("stop_ratio"))
      .withColumn("predicted", when(col("stop_ratio") >= 0.08, "en").otherwise("other"))
      .orderBy("doc_id")
  }

  /** X3 quality scoring: lexical diversity + character cleanliness. */
  private def qQualityScore(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.typeTokenRatio(col("text")).as("ttr"),
        TextOps.alphaRatio(col("text")).as("alpha_ratio"),
        TextOps.qualityScore(col("text")).as("score"))
      .orderBy("doc_id")

  /** X3 document fingerprinting (md5, engine-portable). */
  private def qDocFingerprint(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "documents")
      .select(col("doc_id"), TextOps.fingerprint(col("lang"), col("text")).as("fp"))
      .orderBy("doc_id")

  /** X3 repetition filters (the Gopher-style duplicate-n-gram quality
    * rules, Rae et al. 2021): per doc, the duplicate-word fraction and
    * duplicate-3-gram fraction, plus the keep/drop flag a training
    * pipeline applies. Pure per-row array expressions — no shuffle at
    * all; at 100 TB this is a map-only scan.
    */
  private def qRepetitionRatio(s: SparkSession, dir: String): DataFrame = {
    val tk = TextOps.tokens(col("text"))
    val sh = TextOps.shingles(tk, 3)
    read(s, dir, "documents")
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(tk)).cast("double") / size(tk))
          .as("dup_word_frac"),
        when(size(tk) >= 3,
          lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
          .otherwise(lit(0.0)).as("dup_3gram_frac"))
      .withColumn("flagged",
        col("dup_word_frac") > 0.3 || col("dup_3gram_frac") > 0.2)
      .orderBy("doc_id")
  }

  /** X3 mixture weights for multi-source training: per (source, lang),
    * doc/token counts and a sqrt-damped sampling weight (sqrt, not an
    * arbitrary power: IEEE 754 sqrt is correctly rounded on both engines,
    * pow(x, 0.7) is libm-dependent). The exponent damps head sources the
    * way multi-corpus LM mixtures do. Weight normalization goes through
    * exact decimal so the denominator is combine-order-independent.
    */
  private def qMixWeights(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    // the normalization denominator is a keyless window over the GROUP
    // table (|sources| x |langs| rows — bounded by the catalog, not the
    // corpus), which keeps the whole query one scan of documents
    read(s, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .withColumn("w", sqrt(col("n_docs").cast("double")).cast(dec))
      .withColumn("w_total", sum(col("w")).over(Window.partitionBy()))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        (col("w").cast("double") / col("w_total").cast("double")).as("weight"))
      .orderBy("source", "lang")
  }

  /** X3 vocabulary build: term frequencies over the corpus, token ids
    * assigned by rank (freq desc, term asc), truncated to the top 256.
    * The ranking window is keyless but VOCABULARY-sized — distinct terms,
    * not corpus rows — which stays driver-manageable even at 100 TB
    * (natural-language vocabularies plateau in the millions); the
    * frequency aggregation underneath is the corpus-scale shuffle and is
    * map-side combined.
    */
  private def qVocabTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    read(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("token_id",
        row_number().over(Window.orderBy(desc("freq"), asc("term"))) - 1)
      .filter(col("token_id") < 256)
      .select("token_id", "term", "freq")
      .orderBy("token_id")
  }

  /** X3 token coverage curve — the tokenizer-budget statistic (how much
    * of the corpus the top-N vocabulary covers): ranked term frequencies
    * with a running cumulative share. Keyless windows are
    * vocabulary-sized, not corpus-sized (the q_vocab_topk rule); the
    * coverage ratio is one exact-integer division per row, identical
    * IEEE in both engines.
    */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freqs = read(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val byFreq = Window.orderBy(desc("freq"), asc("term"))
    freqs
      .withColumn("rank", row_number().over(byFreq))
      .withColumn("cum_freq", sum("freq")
        .over(byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("freq").over(Window.partitionBy()))
      .filter(col("rank") <= 100)
      .select(col("rank"), col("term"), col("freq"), col("cum_freq"),
        (col("cum_freq").cast("double") / col("total")).as("coverage"))
      .orderBy("rank")
  }

  /** X3 Zipf fit — least-squares slope of ln(freq) on ln(rank) over the
    * top-100 vocabulary (a natural corpus obeys slope ≈ −1; drift is a
    * data-quality signal). ln values round to 6dp BEFORE the moment sums
    * (libm parity, the q_drift_psi convention); the moments accumulate in
    * exact decimals (stableSum/stableSumProd), so the closed-form slope
    * and intercept are bit-stable across partitionings and engines.
    */
  private def qTokenZipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = read(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(Window.orderBy(desc("freq"), asc("term"))))
      .filter(col("rank") <= 100)
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("freq").cast("double")), 6).as("y"))
    val m = pts.agg(count(lit(1)).as("n"),
      Scalar.stableSum(col("x")).as("sx"), Scalar.stableSum(col("y")).as("sy"),
      Scalar.stableSumProd(col("x"), col("y")).as("sxy"),
      Scalar.stableSumProd(col("x"), col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("n").as("n_terms"), round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
  }

  /** X3 mixture rebalancing by per-source cap: each source keeps ~cap
    * docs via a deterministic hash gate — `mixed(doc_id) mod n_src <
    * min(n_src, cap)`, cap=10 — the downsample-overrepresented-sources op every
    * training mix applies, reproducible across engines/runs/partitions
    * (same portable-hash discipline as q_sample_hash; rand() would be
    * none of those). Source counts broadcast; the gate is map-side.
    */
  private def qSourceCapSample(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val h = TextOps.mixRound(
      TextOps.mixRound(pmod(col("doc_id"), lit(TextOps.HashMod)),
        TextOps.DefaultMixMult), TextOps.DefaultMixMult)
    docs.join(broadcast(counts), "source")
      .filter(pmod(h, col("n_src")) < least(col("n_src"), lit(10L)))
      .select("doc_id", "source", "n_src")
      .orderBy("doc_id")
  }

  /** X1×X3 the END-TO-END curation pipeline as ONE plan — the LLM-data
    * counterpart of the reference's mart-assembly flagship: quality gate
    * (token count ≥ 30) → exact dedup on normalized text (keep lowest
    * doc_id per duplicate set) → per-source cap-10 hash downsample →
    * per-source corpus accounting. Every stage is an operator already
    * oracle-proven in isolation; this query witnesses them CHAINED —
    * Catalyst fuses the gate into the scan, the dedup window and the cap
    * join shuffle on their own keys, and the final rollup is
    * map-side-combinable. All-integer outputs, hash-exact.
    */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = read(s, dir, "documents")
      .withColumn("norm", trim(lower(col("text"))))
      .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tok") >= 30)
    val deduped = docs
      .withColumn("rn",
        row_number().over(Window.partitionBy("norm").orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select("doc_id", "source", "n_tok")
    val counts = deduped.groupBy("source").agg(count(lit(1)).as("n_src"))
    val h = TextOps.mixRound(
      TextOps.mixRound(pmod(col("doc_id"), lit(TextOps.HashMod)),
        TextOps.DefaultMixMult), TextOps.DefaultMixMult)
    deduped.join(broadcast(counts), "source")
      .filter(pmod(h, col("n_src")) < least(col("n_src"), lit(10L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("source")
  }

  /** X4 multimodal metadata over the opaque binary payload. */
  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Media.metadata(read(s, dir, "documents")).orderBy("doc_id")

  /** X4 frame sampling over the payload stream (every 256th offset, 64-unit
    * frames, portable-hash fingerprints) — oracle-checked end to end.
    */
  private def qMediaFrames(s: SparkSession, dir: String): DataFrame =
    Media.frameSample(s, read(s, dir, "documents"))
      .orderBy("doc_id", "frame_idx")

  /** X4 partition-wise feature extraction. The DECODER is still the
    * deterministic stub (no codecs in this environment — Media.fakeDecode,
    * never claimed as more), but the stub's math is now itself
    * hash-gated: the payloads are pure-ASCII text stand-ins, so the
    * oracle recomputes the 8-bin byte histogram, the f32 L1
    * normalization (float4 division is correctly-rounded IEEE in both
    * engines), and the pseudo-dimensions from the planted payloads —
    * closing the round-5 `no_oracle` row without pretending the decode
    * is real. The fixed-shape array<float> feature vector is serialized
    * to a scaled-int string for the dump — the driver's pandas compare
    * can't sort ndarray cells.
    */
  private def qMediaFeatures(s: SparkSession, dir: String): DataFrame =
    Media.extractFeatures(s, read(s, dir, "documents")).toDF()
      .withColumn("features", serializeFloats(col("features")))
      .orderBy("doc_id")

  // =====================================================================
  // round-2 widening: dedup groups, stats, TF-IDF, joins, sampling
  // =====================================================================

  /** X1 dedup GROUPS: near-dup pairs (exact n-gram Jaccard >= 0.5) fed
    * through min-label connected components — every doc labeled with the
    * smallest doc_id in its similarity component (the keep-one-per-group
    * step of a dedup pipeline). Oracle: recursive-CTE transitive closure.
    */
  private def qDedupGroups(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    Dedup.dedupGroups(docs, pairs, "doc_id").orderBy("doc_id")
  }

  /** X1 end-to-end dedup: similarity groups → keep ONE doc per group, the
    * one with the best quality score (doc_id tiebreak) — the row set a
    * training pipeline actually emits after near-dup detection.
    */
  private def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = read(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b")
    val groups = Dedup.dedupGroups(docs, pairs, "doc_id")
    val w = Window.partitionBy("group_id").orderBy(desc("score"), asc("doc_id"))
    docs.join(groups, "doc_id")
      .withColumn("score", TextOps.qualityScore(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("group_id", "doc_id", "score")
      .orderBy("group_id")
  }

  /** Correlation + stddev per quarter from exact decimal moments — the
    * built-in corr()/stddev() double accumulators are combine-order-
    * dependent, so at 1000-executor scale they are not reproducible;
    * moments in exact DECIMAL then one double formula are.
    */
  private def qCorrStats(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val n = count(lit(1)).cast("double")
    li.groupBy(Scalar.toQuarter(col("l_shipdate")).as("Quarter"))
      .agg(n.as("n"),
        Scalar.stableSum(col("l_quantity")).as("sx"),
        Scalar.stableSum(col("l_extendedprice")).as("sy"),
        Scalar.stableSumProd(col("l_quantity"), col("l_quantity")).as("sxx"),
        Scalar.stableSumProd(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
        Scalar.stableSumProd(col("l_quantity"), col("l_extendedprice")).as("sxy"))
      .select(col("Quarter"),
        // corr's numerator n·Σxy − Σx·Σy cancels catastrophically (the
        // result is ~1e-3 of the operands), so a 1-ulp FMA-contraction
        // difference between engines surfaces at ~1e-13 relative — round
        // to 9 decimals on both sides to absorb it. std has no such
        // cancellation and stays exact.
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9).as("corr_qty_price"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))).as("std_qty"))
      .orderBy("Quarter")
  }

  /** X3 TF-IDF: top-5 terms per doc by tf·ln(N/df). Scores are rounded to
    * 10 decimals BEFORE ranking on both engines — ln() may differ by 1 ulp
    * between libm implementations, and the rounded value is what the
    * row_number orders by, so ranking and output stay cross-engine stable.
    */
  private def qTfidf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = read(s, dir, "documents")
    val terms = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("len", sum("cnt").over(Window.partitionBy("doc_id")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        round((col("cnt").cast("double") / col("len")) *
          log(col("n_docs").cast("double") / col("df")), 10))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))))
      .filter(col("rk") <= 5)
      .select(col("doc_id"), col("term"), col("score"))
      .orderBy("doc_id", "term")
  }

  /** Semi/anti join vocabulary: customers with vs without orders, tagged
    * into one result (EXISTS / NOT EXISTS in the oracle). Left-semi/anti
    * are the forms that never duplicate or widen rows — at scale they
    * shuffle only the key column.
    */
  private def qJoinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = read(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val o = read(s, dir, "orders").select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("op", lit("has_orders"))
      .unionByName(
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .withColumn("op", lit("no_orders")))
      .orderBy("c_custkey")
  }

  /** Fixed-width 20-bin histogram of o_totalprice: global min/max in one
    * tiny agg (broadcast), bin = floor((x-min)/w) capped into the last
    * bin. All-double IEEE arithmetic — bin edges identical cross-engine.
    * Degenerate guard: all-equal values give w=0 and 0/0; both engines
    * pin that case to bin 0 instead of relying on NaN semantics.
    */
  private def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders")
    val mm = o.agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    o.crossJoin(broadcast(mm))
      .withColumn("w", (col("mx") - col("mn")) / lit(20.0))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0.0))
          .otherwise(least(floor((col("o_totalprice") - col("mn")) / col("w")), lit(19.0)))
          .cast("int"))
      .groupBy("bin")
      .agg((first(col("mn")) + col("bin") * first(col("w"))).as("lo"),
        count(lit(1)).as("n"))
      .select("bin", "lo", "n")
      .orderBy("bin")
  }

  /** Z-score outliers per quarter from exact decimal moments (same
    * stability argument as qCorrStats). Threshold 1.7, not the textbook 3:
    * o_totalprice is uniform-ish, and a uniform's |z| caps at sqrt(3) ≈
    * 1.73 — anything above that returns nothing on this data.
    */
  private def qZscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders")
      .withColumn("Quarter", Scalar.toQuarter(col("o_orderdate")))
    val n = count(lit(1)).cast("double")
    val mom = o.groupBy("Quarter")
      .agg(n.as("n"), Scalar.stableSum(col("o_totalprice")).as("s1"),
        Scalar.stableSumProd(col("o_totalprice"), col("o_totalprice")).as("s2"))
      .select(col("Quarter"), (col("s1") / col("n")).as("mean"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("std"))
    o.join(broadcast(mom), "Quarter")
      // rounded like corr_qty_price: the mean/std derivation is exposed to
      // FMA-contraction ulp differences between engines
      .withColumn("z", round((col("o_totalprice") - col("mean")) / col("std"), 9))
      .filter(abs(col("z")) > 1.7)
      .select("o_orderkey", "Quarter", "o_totalprice", "z")
      .orderBy("o_orderkey")
  }

  /** Deterministic hash sample (~5%) of lineitem: portable integer mix of
    * the (orderkey, linenumber) key — reproducible across engines, runs,
    * and partitionings, unlike rand()-based sampling; the standard trick
    * for a stable eval holdout over a 100 TB corpus.
    */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame = {
    val m = TextOps.HashMod
    val k0 = pmod(col("l_orderkey") * lit(31L) + col("l_linenumber"), lit(m))
    val h = TextOps.mixRound(TextOps.mixRound(k0, TextOps.DefaultMixMult), TextOps.DefaultMixMult)
    read(s, dir, "lineitem")
      .filter(pmod(h, lit(100L)) < 5)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Range join: lineitems matched to a derived quarter dimension by
    * l_shipdate ∈ [qstart, qend) — the dimension is tiny so the non-equi
    * join broadcasts (BroadcastNestedLoopJoin over ~30 rows), which is the
    * correct 100 TB shape: fact scan × broadcast ranges, no shuffle.
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val qdim = read(s, dir, "orders")
      .select(date_trunc("quarter", col("o_orderdate")).cast("date").as("qstart")).distinct()
      .withColumn("qend", add_months(col("qstart"), 3))
    read(s, dir, "lineitem")
      .join(broadcast(qdim),
        col("l_shipdate") >= col("qstart") && col("l_shipdate") < col("qend"))
      .groupBy("qstart").agg(count(lit(1)).as("n_items"))
      .orderBy("qstart")
  }

  /** F-suite regex GROUP extraction (the reference's header regexes strip
    * and capture, src:141-149): pull the numeric id out of the brand code
    * and aggregate by it — capture-group semantics are identical across
    * engines for RE2-compatible patterns.
    */
  private def qRegexExtract(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part")
      .select(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"))
      .groupBy("brand_num").agg(count(lit(1)).as("n"))
      .orderBy("brand_num")

  /** Arg-extrema + conditional-count vocabulary: per quarter the keys of
    * the priciest and cheapest orders (max_by/min_by == DuckDB
    * arg_max/arg_min) plus a filtered count. The ordering key is a
    * zero-padded composite string (price cents + orderkey) because a
    * unique total order is what makes arg-extrema deterministic — and
    * DuckDB's arg_max has no struct-key overload.
    */
  private def qMinmaxBy(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    val key = concat(lpad(cents.cast("string"), 12, "0"), lit("#"),
      lpad(col("o_orderkey").cast("string"), 12, "0"))
    read(s, dir, "orders")
      .withColumn("Quarter", Scalar.toQuarter(col("o_orderdate")))
      .withColumn("k", key)
      .groupBy("Quarter")
      .agg(expr("max_by(o_orderkey, k)").as("top_order"),
        expr("min_by(o_orderkey, k)").as("bottom_order"),
        expr("count_if(o_orderpriority = '1-URGENT')").as("n_urgent"))
      .orderBy("Quarter")
  }

  /** Ordered collect: per priority the sorted distinct order statuses as
    * one joined string (array output itself would break the driver's
    * pandas compare) plus a count.
    */
  private def qCollectAgg(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** S1 variant: JSON-lines sink + schema'd re-read (the wire format of
    * the reference's API fetches, as a file roundtrip). Explicit schema —
    * a JSON scan must never infer on a 100 TB feed.
    */
  private def qScanJsonl(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("scan_jsonl", dir)
    read(s, dir, "nation").coalesce(1).write.mode("overwrite").json(tmp)
    s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").json(tmp)
      .orderBy("n_nationkey")
  }

  /** F-suite string vocabulary: case, padding, translate, edit distance,
    * substring — every one a codegen'd built-in with an exact DuckDB twin
    * (levenshtein is integer-valued, so cross-engine exact).
    */
  private def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        translate(col("p_type"), " ", "_").as("type_snake"),
        levenshtein(col("p_brand"), lit("Brand#13")).cast("int").as("lev"),
        substring(col("p_name"), 1, 10).as("frag"))
      .orderBy("p_partkey")

  /** Ranking-window vocabulary: top-5 orders per quarter with rank /
    * percent_rank / ntile — rank ties broken by the unique orderkey so
    * both engines produce one total order.
    */
  private def qWindowRanks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("Quarter").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    read(s, dir, "orders")
      .withColumn("Quarter", Scalar.toQuarter(col("o_orderdate")))
      .withColumn("rk", rank().over(w).cast("int"))
      .withColumn("pct_rk", percent_rank().over(w))
      .withColumn("quartile", ntile(4).over(w).cast("int"))
      .filter(col("rk") <= 5)
      .select("Quarter", "o_orderkey", "o_totalprice", "rk", "pct_rk", "quartile")
      .orderBy("Quarter", "rk")
  }

  /** Calendar resample: generated month spine left-joined to a SPARSE
    * monthly series (big urgent orders hit ~23 of 80 months), then
    * forward-filled — the reference's quarterly-spine + reindex pattern
    * (src:353,441) generalized to gap-filling.
    */
  private def qMonthSpine(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = read(s, dir, "orders")
    val mm = o.agg(min(date_trunc("month", col("o_orderdate"))).cast("date").as("mn"),
      max(date_trunc("month", col("o_orderdate"))).cast("date").as("mx"))
    val spine = mm.select(
      explode(sequence(col("mn"), col("mx"), expr("interval 1 month"))).as("month"))
    val sparse = o
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 495000.0)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(Scalar.stableAvg(col("o_totalprice")).as("avg_big_urgent"))
    spine.join(sparse, Seq("month"), "left")
      .withColumn("filled", last(col("avg_big_urgent"), ignoreNulls = true)
        .over(Window.orderBy("month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("month")
  }

  /** Two-phase salted aggregation as a query: each hot quarterly key is
    * spread over 16 reducers then recombined (ops.Skew). With exact
    * decimal accumulation salting is a PURE physical rewrite — the oracle
    * is the plain unsalted aggregation and the hashes must match exactly.
    */
  private def qSkewSalted(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedSumCount(
        read(s, dir, "lineitem"),
        key = Scalar.toQuarter(col("l_shipdate")),
        value = col("l_quantity"),
        saltSrc = Seq(col("l_orderkey"), col("l_linenumber")))
      .withColumnRenamed("_key", "Quarter")
      .orderBy("Quarter")

  /** Bucketed co-located join as a query: both sides persisted
    * bucketed+sorted on the join key (ops.Bucketing), so the fact-to-fact
    * join reads bucket i against bucket i with NO shuffle exchange — the
    * one-time write pays the exchange that would otherwise dominate a
    * 100 TB join (shuffle-freedom is plan-asserted in BucketingSpec).
    */
  private def qJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    // mtime stamp over BOTH source tables: regenerating either one must
    // rebuild the layouts — a lineitem-only stamp would silently reuse
    // stale orders bucket files after an orders-only regeneration
    val stamp = s"${new java.io.File(s"$dir/lineitem.parquet").lastModified()}" +
      s"_${new java.io.File(s"$dir/orders.parquet").lastModified()}"
    val suffix = s"${dirTag(dir)}_$stamp"
    val base = s"${tmpDir("bucketed_join", dir)}_$stamp"
    graft.ops.Bucketing.ensureBucketed(s,
      read(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
      s"li_bkt$suffix", s"$base/li", 8, "l_orderkey")
    graft.ops.Bucketing.ensureBucketed(s,
      read(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
      s"ord_bkt$suffix", s"$base/ord", 8, "o_orderkey")
    val a = graft.ops.Bucketing.readTable(s, s"li_bkt$suffix")
    val b = graft.ops.Bucketing.readTable(s, s"ord_bkt$suffix")
    a.join(b, a("l_orderkey") === b("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(Scalar.stableSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Map-typed vocabulary: per-quarter map of returnflag → quantity sum
    * (map_from_entries over collected entries), extracted back to columns
    * with try_element_at (ANSI mode: plain element_at throws on a missing
    * key). Map construction order is irrelevant — keys are unique — so
    * the unordered collect_list is safe.
    */
  private def qMapPivot(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .groupBy(Scalar.toQuarter(col("l_shipdate")).as("Quarter"),
        col("l_returnflag").as("flag"))
      .agg(Scalar.stableSum(col("l_quantity")).as("qty"))
      .groupBy("Quarter")
      .agg(map_from_entries(collect_list(struct(col("flag"), col("qty")))).as("m"))
      .select(col("Quarter"),
        expr("try_element_at(m, 'A')").as("qty_a"),
        expr("try_element_at(m, 'N')").as("qty_n"),
        expr("try_element_at(m, 'R')").as("qty_r"))
      .orderBy("Quarter")

  /** Structured Streaming through the CORRECTNESS gate: the quarterly
    * roll-up runs as an incremental streaming query over a file feed of
    * the events table (micro-batches, memory sink, driven to completion)
    * and must hash-match the BATCH oracle — stream/batch agreement as an
    * oracle-checked property, not just a spec assertion. Decimal-stable
    * sum keeps the streamed partial aggregation bit-equal to DuckDB.
    */
  private def qStreamQuarterly(s: SparkSession, dir: String): DataFrame = {
    val feed = stageFeed(dir, "stream_feed")
    val ev = graft.streaming.EventStreams.readEventStream(s, feed)
    val agg = ev
      .withWatermark("ts", "1 day")
      .groupBy(Scalar.toQuarter(col("ts")).as("Quarter"))
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
    // Complete mode: the memory sink holds the FINAL aggregate table even
    // if the feed arrives as several micro-batches — Update mode would
    // append one row per key per batch (duplicate Quarters, stale
    // partials) the moment the feed isn't a single file.
    graft.streaming.EventStreams.runToCompletion(s, agg,
        "stream_quarterly_" + dirTag(dir), org.apache.spark.sql.streaming.OutputMode.Complete)
      .orderBy("Quarter")
  }

  /** X1×X5 streaming exact dedup through the CORRECTNESS gate: the events
    * table is staged TWICE into the feed (an at-least-once delivery), the
    * watermarked dropDuplicatesWithinWatermark stream collapses it, and
    * the result must hash-match the batch DISTINCT oracle — the
    * exactly-once-table guarantee checked cross-engine, not just spec'd.
    */
  private def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val feed = stageFeed(dir, "stream_dedup_feed",
      names = Seq("dup0.parquet", "dup1.parquet")) // at-least-once: staged twice
    val deduped = graft.streaming.EventStreams
      .dedupStream(graft.streaming.EventStreams.readEventStream(s, feed))
      .select("event_id", "user_id", "event_type", "value")
    graft.streaming.EventStreams.runToCompletion(s, deduped,
        "stream_dedup_" + dirTag(dir), org.apache.spark.sql.streaming.OutputMode.Append)
      .orderBy("event_id")
  }

  // =====================================================================
  // round-3 widening: PII, decontamination, global ids, stratified
  // sampling, ORC
  // =====================================================================

  /** X3 PII redaction: emails / phone fragments / IPv4 literals replaced
    * by typed placeholders, with per-kind match counts. The synthetic
    * corpus carries no PII, so the PII is PLANTED deterministically from
    * key columns (both engines build the identical enriched text — the
    * construction is part of the query, not a fixture); the redaction
    * itself is three codegen'd regexp_replace passes over RE2-compatible
    * patterns — a map-only scan with zero shuffle at 100 TB.
    */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val contact = concat(
      lit("user"), col("doc_id").cast("string"), lit("@"), col("source"),
      lit(".org tel 555-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" ip 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7"))
    read(s, dir, "documents")
      .withColumn("enriched", concat(col("text"), lit(" "), contact))
      .select(col("doc_id"),
        TextOps.redactPii(col("enriched")).as("redacted"),
        regexp_count(col("enriched"), lit(TextOps.PiiEmailPattern)).cast("int").as("n_emails"),
        regexp_count(col("enriched"), lit(TextOps.PiiPhonePattern)).cast("int").as("n_phones"),
        regexp_count(col("enriched"), lit(TextOps.PiiIpPattern)).cast("int").as("n_ips"))
      .orderBy("doc_id")
  }

  /** X1 benchmark decontamination: flag every training doc sharing any
    * word 8-gram with the eval slice (doc_id % 10 == 8 stands in for a
    * benchmark suite — the rule intersects the corpus's planted
    * near-dups, so hits exist at every SF). Eval shingles broadcast;
    * corpus side is one scan (Dedup.contaminationHits).
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    Dedup.contaminationHits(read(s, dir, "documents"),
        pmod(col("doc_id"), lit(10L)) === 8, n = 8)
      .orderBy("doc_id")

  /** Dense contiguous global row ids without a single-task global sort
    * (Ordered.globalRowIds): ids equal `row_number() OVER (ORDER BY
    * o_orderkey)` — the oracle — but every partition ranks in parallel.
    */
  private def qGlobalIds(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ordered.globalRowIds(
        read(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        Seq(col("o_orderkey")), "gid")
      .select("o_orderkey", "o_orderpriority", "gid")
      .orderBy("o_orderkey")

  /** Deterministic stratified sampling: per-language keep rates (en 50%,
    * others 10%) decided by the portable hash of the doc id — the
    * reproducible per-stratum downsampling a multilingual corpus mix
    * applies before training. Pure map-side filter: no shuffle, the same
    * sample every run, partitioning, and engine (rand()-based sampling is
    * none of those).
    */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = TextOps.mixedHash(col("doc_id").cast("string"))
    read(s, dir, "documents")
      .filter(pmod(h, lit(100L)) <
        when(col("lang") === "en", lit(50L)).otherwise(lit(10L)))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** S1 columnar-format roundtrip beyond parquet: events → ORC (written
    * once per sf-dir, mtime-stamped like the bucketed-join layout — re-runs
    * reuse it) → ORC scan → aggregate. The ORC reader does the same column
    * pruning + predicate pushdown as parquet, so the filter lands in the
    * scan, and the oracle reads the ORIGINAL parquet: the roundtrip must
    * be value-exact, not just shape-preserving.
    */
  private def qScanOrc(s: SparkSession, dir: String): DataFrame = {
    val stamp = new java.io.File(s"$dir/events.parquet").lastModified()
    val tmp = s"${tmpDir("scan_orc", dir)}_$stamp"
    if (!new java.io.File(s"$tmp/_SUCCESS").exists())
      Tables.events(s, dir).select("event_id", "event_type", "value")
        .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .filter(col("event_type") =!= "error")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  // =====================================================================

  /** X5 custom stateful sessionization run THROUGH the streaming engine
    * (flatMapGroupsWithState, event-time timeout) against the batch
    * gaps-and-islands oracle — same 5-minute gap as `q_sessionize`, so
    * the custom state machine and the declarative window formulation are
    * cross-checked against each other via DuckDB. Only watermark-FINAL
    * (closed) sessions are compared: the engine can close a session only
    * once the watermark (max event time − 30 min delay) passes its end +
    * gap, and the oracle applies the identical cutoff — streaming
    * finality semantics, reproduced in SQL.
    */
  private def qStreamSessionize(s: SparkSession, dir: String): DataFrame = {
    val feed = stageFeed(dir, "stream_sess_feed", names = Seq("events.parquet"))
    val sess = graft.streaming.EventStreams.sessionize(s,
      graft.streaming.EventStreams.readEventStream(s, feed),
      watermarkDelay = "30 minutes", gapMs = 5L * 60 * 1000)
    graft.streaming.EventStreams.runToCompletion(s, sess.toDF(),
        "stream_sessionize_" + dirTag(dir), org.apache.spark.sql.streaming.OutputMode.Update)
      .filter(col("closed"))
      .select("user_id", "session_start_ms", "n_events", "duration_secs")
      .orderBy("user_id", "session_start_ms")
  }

  // =====================================================================
  // round-3 widening, part 2: normalization, line dedup, packing,
  // quantization, salted join
  // =====================================================================

  /** X3 Unicode NFC normalization over the corpus — the pass that makes
    * byte-keyed dedup/fingerprinting see visually-identical text as equal.
    * The ASCII testdata is NFC-trivial, so decomposed sequences are
    * PLANTED deterministically (every 'a' becomes 'a' + U+0301 COMBINING
    * ACUTE — the construction is part of the query, both engines build the
    * identical string); normalization composes them back to U+00E1 via the
    * codegen'd [[graft.functions.NfcNormalize]] expression (Spark has no
    * builtin; a UDF would break whole-stage codegen on a full-corpus
    * scan). Map-only, zero shuffle. The code-point lengths expose the
    * composition: len_nfc < len_raw exactly where pairs composed.
    */
  private def qTextNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.NfcNormalize.register(s)
    read(s, dir, "documents")
      // decomposed plant: 'a' + U+0301 (the oracle spells it chr(769) —
      // Spark's chr() is ASCII-only, so this side uses the escape literal)
      .withColumn("raw", replace(col("text"), lit("a"), lit("a\u0301")))
      .select(col("doc_id"),
        graft.functions.NfcNormalize.nfcNormalize(col("raw")).as("nfc_text"),
        length(col("raw")).cast("int").as("len_raw"),
        length(graft.functions.NfcNormalize.nfcNormalize(col("raw")))
          .cast("int").as("len_nfc"))
      .orderBy("doc_id")
  }

  /** X1 cross-document repeated-span removal (CCNet/RefinedWeb line
    * dedup; Dedup.lineDedup): consecutive 8-token spans deduped
    * corpus-wide (first occurrence by (doc_id, pos) wins), documents
    * rebuilt from surviving spans. The planted near-dup docs lose their
    * repeated spans; a later exact duplicate comes back empty.
    */
  private def qLineDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.lineDedup(read(s, dir, "documents"), chunkTokens = 8)
      .orderBy("doc_id")

  /** X1 exact duplicated-substring spans (Lee et al. 2022's ExactSubstr
    * dedup, relationally): maximal cross-document runs of shared 4-token
    * grams covering >= 8 tokens, via inverted-index candidates and a
    * diagonal gaps-and-islands merge — the duplicated REGIONS that
    * document-level dedup can't see and q_line_dedup's fixed chunking
    * only catches when aligned. Gram strings, integer positions, and the
    * window arithmetic are all engine-portable: fully oracle-checked.
    */
  private def qDupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(read(s, dir, "documents"), k = 4, minTokens = 8)
      .orderBy("doc_a", "doc_b", "a_start", "b_start")

  /** X3 sequence packing: concatenate the corpus in doc_id order and cut
    * it into fixed 512-token training sequences — each doc's pack_id and
    * starting offset form the packing manifest a trainer consumes. The
    * token counting is a map-only corpus scan; the exclusive prefix sum
    * runs on the NARROW (id, n_tok) manifest via the distributed
    * range-partition + broadcast-offsets scaffold (Ordered.prefixSum) —
    * no single-task global window anywhere.
    */
  private def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val manifest = read(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    graft.ops.Ordered.prefixSum(manifest, Seq(col("doc_id")), col("n_tok"), "cum_before")
      .select(col("doc_id"), col("n_tok"), col("cum_before"),
        expr("cum_before DIV 512").as("pack_id"),
        pmod(col("cum_before"), lit(512L)).as("pack_off"))
      .orderBy("doc_id")
  }

  /** X2 symmetric int8 embedding quantization (Similarity.quantizeInt8):
    * 4× smaller vectors for every downstream ANN shuffle/scan, with the
    * per-vector reconstruction error bound surfaced so a pipeline can
    * gate on it. Map-only. Quantized values ride a plain int-string
    * serialization (same rationale as serializeFloats: the driver compare
    * can't sort ndarray cells).
    */
  private def qEmbedQuantize(s: SparkSession, dir: String): DataFrame =
    graft.sim.Similarity.quantizeInt8(read(s, dir, "embeddings"))
      .select(col("vec_id"), round(col("scale"), 9).as("scale"),
        array_join(transform(col("q"), _.cast("string")), ",").as("q_str"),
        round(col("max_err"), 9).as("max_err"))
      .orderBy("vec_id")

  /** Salted sort-merge join on a hot key (Skew.saltedEquiJoin): event_type
    * has 5 values over the whole fact table — the canonical funnel-one-
    * reducer shape when the dim side can't broadcast. The dim replicates
    * 8×, facts salt deterministically off event_id, the join key becomes
    * (event_type, salt) — row-identical to the unsalted join (the oracle
    * IS the unsalted join; SkewSpec asserts the merge-join plan).
    */
  private def qSkewJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "event_type", "value")
    val dim = ev.select("event_type").distinct()
      .withColumn("type_weight", length(col("event_type")).cast("int"))
    graft.ops.Skew.saltedEquiJoin(ev, dim, "event_type", Seq(col("event_id")), salts = 8)
      .select("event_id", "event_type", "type_weight", "value")
      .orderBy("event_id")
  }

  /** X3 unigram-LM surprisal scoring — the model-based quality filter of
    * web-corpus pipelines (docs whose tokens are uniformly high-frequency
    * read as boilerplate; rare-token-dense docs as noise): corpus term
    * frequencies (one map-side-combined aggregation), then every doc's
    * mean −ln p(token) under that unigram model. The per-token join is a
    * hash equi-join on the term — at 100 TB the vocabulary is shuffled,
    * not broadcast (web vocabularies run 10^8 terms), and both sides are
    * (term, count) slim. ln() is libm-dependent, so the mean is rounded
    * to 6 places on both engines (SURVEY §5.1 float-parity rule).
    */
  private def qUnigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("term").agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum("tf").as("n_total"))
    toks.join(tf, "term").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("tf").cast("double") / col("n_total"))), 6)
          .as("surprisal"))
      .orderBy("doc_id")
  }

  /** S6+ dynamic partition overwrite ("upsert" at partition granularity —
    * the standard warehouse backfill: rewrite ONE day in place without
    * touching the others). Full daily-partitioned write, then an overwrite
    * of only 2024-01-15 with corrected (doubled) values via
    * partitionOverwriteMode=dynamic; the read-back aggregate proves the
    * other ~30 day-partitions survived untouched while the backfilled day
    * carries the fix. (The key is a day STRING, not Quarter — the events
    * table spans one month, and a one-partition table would make the
    * leave-the-rest-alone semantics vacuous.)
    */
  private def qSinkUpsert(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("sink_upsert", dir)
    val ev = Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "day", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("day").parquet(tmp)
    ev.filter(col("day") === "2024-01-15")
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(tmp)
    s.read.parquet(tmp)
      // partition-dir names type-infer back as DATE; the declared schema
      // (and the oracle) keep the day a plain string
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
      .orderBy("day")
  }

  // =====================================================================
  // round-3 part 3: token entropy, EWMA smoothing, batched ANN,
  // stream-static enrichment
  // =====================================================================

  /** X3 per-doc unigram (token) Shannon entropy in bits — the lexical-
    * diversity signal quality filters threshold on (low-entropy docs are
    * boilerplate/spam): H = log2(N) − (Σ c·ln c)/(N·ln 2) over the doc's
    * term counts c. One explode and two map-side-combinable aggregations;
    * the (doc, term) shuffle carries counts, never text, so at 100 TB the
    * shuffled bytes are the vocabulary footprint per doc, not the corpus.
    * Rounded at 6 like q_unigram_logprob (ln() means cross libm).
    */
  private def qTokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val n = sum(col("c")).cast("double")
    read(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        round((log(n) - sum(col("c").cast("double") * log(col("c").cast("double"))) / n)
          / log(lit(2.0)), 6).as("entropy"))
      .orderBy("doc_id")
  }

  /** O1+ exponential moving average over the daily event spine — the
    * time-series smoothing an ops dashboard runs on ingest volumes. The
    * recursion y_i = 0.75·y_{i−1} + 0.25·x_i is evaluated as a left fold
    * over the prefix history (collect_list window + `aggregate`), which
    * fixes the FP operation order and makes the result bit-identical to
    * DuckDB's list_reduce of the same prefix. The keyless-looking window
    * is per-event_type over a CALENDAR-bounded spine (days × types, like
    * q_month_spine) — the corpus-scale work is the daily count
    * aggregation underneath, which shuffles once and map-side-combines.
    */
  private def qEwmaDaily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hist", collect_list(col("n").cast("double")).over(w))
      .withColumn("ewma", round(expr(
        "aggregate(slice(hist, 2, greatest(size(hist) - 1, 0)), " +
          "element_at(hist, 1), (acc, x) -> acc * 0.75 + x * 0.25)"), 9))
      .select("event_type", "day", "n", "ewma")
      .orderBy("event_type", "day")
  }

  /** X2 batched ANN: ten query vectors (vec_id % 50 = 0) resolve their
    * top-5 neighbors in ONE pass — see [[Similarity.annTopkBatch]] for the
    * band-join shape. Portable planes keep the bucketing (and therefore
    * the candidate set) reproducible in the SQL oracle.
    */
  private def qAnnBatch(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopkBatch(s, read(s, dir, "embeddings"),
      queryPred = pmod(col("vec_id"), lit(50L)) === 0, k = 5)
      .orderBy("query_id", "rk")

  /** S4+X5 stream-static enrichment join through the CORRECTNESS gate:
    * the events feed (file-source micro-batches) joins the
    * customer→nation dimension — a STATIC broadcast rebuilt per
    * micro-batch, the standard pattern for enriching a fact stream with
    * warehouse dims — then rolls up per (nation, event_type) under a
    * watermark. Must hash-match the batch join oracle: stream/batch
    * agreement for the join+agg pipeline, not just a single aggregate.
    */
  private def qStreamEnrich(s: SparkSession, dir: String): DataFrame = {
    val feed = stageFeed(dir, "stream_enrich_feed")
    val dim = broadcast(
      read(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
        .join(read(s, dir, "nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_name")),
          "c_nationkey")
        .select("user_id", "n_name"))
    val agg = graft.streaming.EventStreams.readEventStream(s, feed)
      .withWatermark("ts", "1 day")
      .join(dim, "user_id")
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
    graft.streaming.EventStreams.runToCompletion(s, agg,
        "stream_enrich_" + dirTag(dir), org.apache.spark.sql.streaming.OutputMode.Complete)
      .orderBy("n_name", "event_type")
  }

  /** A5+ GROUPING SETS via the Spark 4 `Dataset.groupingSets` API — the
    * third grouping-analytics shape next to rollup/cube: exactly the
    * requested margins ((flag, status), (flag), ()) in ONE pass over the
    * fact table (Catalyst's Expand — no per-set re-scan), with
    * `grouping_id` disambiguating a grouped NULL from a margin NULL.
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(Scalar.stableSum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** O2+ type-2 slowly-changing dimension from a change log
    * (ops/Changes.scd2): each user's `signup` events become versioned
    * rows with half-open [valid_from, valid_to) intervals and an
    * is_current flag — one window shuffle on the business key, no
    * quadratic self-join. (event_id tie-break: same-timestamp changes
    * must version deterministically or the intervals depend on
    * partitioning.)
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame =
    graft.ops.Changes.scd2(
        Tables.events(s, dir).filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("value").as("plan_value")),
        "user_id", "ts", "event_id")
      .select(col("user_id"), col("version"), col("event_id"),
        col("valid_from"), col("valid_to"), col("is_current"), col("plan_value"))
      .orderBy("user_id", "version")

  /** S6+ CDC changelog merge (ops/Changes.cdcMerge): MERGE INTO semantics
    * — latest op per key wins (U/I upsert, D delete), unchanged base rows
    * pass through. The changelog is derived DETERMINISTICALLY from the
    * base table (key-modulo slices: two stacked updates exercising
    * latest-wins, deletes, fresh-key inserts) so the oracle can rebuild
    * the identical log in SQL. Shape: one window on the changelog + one
    * co-partitioned full-outer join — what a lakehouse MERGE compiles to
    * when the changelog outgrows broadcast.
    */
  private def qCdcMerge(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val base = read(s, dir, "orders")
      .select(k, col("o_totalprice"), col("o_orderstatus"))
    val upd1 = base.filter(pmod(k, lit(100L)) === 3)
      .select(k, lit(1L).as("seq"), lit("U").as("op"),
        (col("o_totalprice") + 10.0).as("o_totalprice"), lit("P").as("o_orderstatus"))
    val upd2 = base.filter(pmod(k, lit(1000L)) === 3)
      .select(k, lit(2L).as("seq"), lit("U").as("op"),
        (col("o_totalprice") + 20.0).as("o_totalprice"), lit("F").as("o_orderstatus"))
    val dels = base.filter(pmod(k, lit(100L)) === 7)
      .select(k, lit(1L).as("seq"), lit("D").as("op"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("string").as("o_orderstatus"))
    val ins = base.filter(pmod(k, lit(100L)) === 11)
      .select((k + 100000000L).as("o_orderkey"), lit(1L).as("seq"),
        lit("I").as("op"), lit(1.0).as("o_totalprice"), lit("O").as("o_orderstatus"))
    val changes = upd1.union(upd2).union(dels).union(ins)
    graft.ops.Changes.cdcMerge(base, changes, "o_orderkey", "seq", "op",
        Seq("o_totalprice", "o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** J1+ explicit bloom-pruned semi-join (functions/Bloom): the urgent-
    * order key set becomes a bloom filter built in ONE aggregate (the
    * serialized filter — KBs — is the only row the driver sees), and the
    * fact scan drops non-matching rows INSIDE whole-stage codegen before
    * any shuffle; the exact semi-join then only sees survivors. At 100 TB
    * this is the difference between shuffling the full fact table into
    * the join and shuffling ~selectivity of it — the same plan Spark's
    * runtime bloom filter injects, surfaced so the filter is built once
    * and reused across fact scans. Result is EXACTLY the plain semi-join
    * (blooms have no false negatives; the join removes false positives),
    * so the oracle is the plain semi-join SQL.
    */
  private def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = read(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bloom = graft.functions.Bloom.buildFilter(dim, "o_orderkey", 100000L)
    read(s, dir, "lineitem")
      .filter(graft.functions.Bloom.mightContain(s, bloom, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(Scalar.stableSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** X2 one-pass distributed Gram matrix (sim/Similarity.gramUpper): the
    * d(d+1)/2 upper-triangle second moments of the embedding corpus,
    * map-generated per row and map-side combined — the only shuffle
    * carries ≤ 2080 partials per partition regardless of corpus size
    * (the input to PCA/whitening at 100 TB).
    */
  private def qEmbedGram(s: SparkSession, dir: String): DataFrame =
    Similarity.gramUpper(read(s, dir, "embeddings"), "embedding")
      .orderBy("i", "j")

  /** O1+ time-RANGE sliding window: per event type, trailing-7-day event
    * count and value sum over the DAILY aggregate — the corpus-scale work
    * is one map-side-combined groupBy; the range frame then runs on the
    * calendar-bounded daily table (days × types rows). RANGE, not ROWS:
    * a gap day must still look back 7 calendar days, not 7 rows. The
    * frame sum accumulates in DECIMAL (DuckDB evaluates window aggregates
    * over a segment tree whose combine order differs from a left fold —
    * only an associative-exact accumulator is cross-engine stable).
    */
  private def qSlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("day").cast("timestamp").cast("long"))
      .rangeBetween(-6L * 86400, 0)
    daily
      .withColumn("n_7d", sum("n").over(w))
      .withColumn("sum_value_7d",
        sum(col("sum_value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double"))
      .orderBy("event_type", "day")
  }

  /** A2+ distribution window functions (ntile / percent_rank / cume_dist)
    * per event type over value — quartile bucketing and empirical CDF, the
    * ranking vocabulary beyond rank/dense_rank (q_window_ranks). The order
    * key includes event_id so ties are impossible and both engines rank
    * identically; the rank ratios are small-integer divisions, bit-stable
    * cross-engine.
    */
  private def qWindowDistribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cdf", cume_dist().over(w))
      .orderBy("event_id")
  }

  /** P8+ Z-order layout key (functions/ZOrderKey, codegen'd Morton
    * interleave): map-only computation of the 2-D locality key over
    * (customer, order-day) — sorting/range-partitioning by it keeps BOTH
    * dimensions' parquet min/max stats tight, so either predicate prunes
    * row groups at 100 TB (a single-column sort prunes one dimension and
    * nothing else). ZOrderSpec asserts the locality property; here the
    * key itself is oracle-checked bit-for-bit.
    */
  private def qZorderKey(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "orders")
      .select(col("o_orderkey"),
        graft.functions.ZOrder.zOrderKey(s,
          col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))).as("zkey"))
      .orderBy("zkey", "o_orderkey")

  /** X5 stream-stream interval join through the CORRECTNESS gate
    * (EventStreams.purchaseAttribution): purchases matched to the same
    * user's views in the preceding 30 minutes, both sides watermarked so
    * join state expires with the watermark. Inner interval-join results
    * emit as matches arrive (append mode — no finality wait), so driving
    * the bounded feed to completion must reproduce the batch join
    * exactly; the oracle is the plain interval self-join SQL.
    */
  private def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val feed = stageFeed(dir, "stream_join_feed")
    val joined = graft.streaming.EventStreams.purchaseAttribution(
      graft.streaming.EventStreams.readEventStream(s, feed))
    graft.streaming.EventStreams.runToCompletion(s, joined,
        "stream_join_" + dirTag(dir), org.apache.spark.sql.streaming.OutputMode.Append)
      .orderBy("purchase_id", "view_id")
  }

  /** X3 bigram-LM surprisal — the conditional upgrade of
    * q_unigram_logprob (fluency, not just vocabulary rarity: a doc of
    * common words in nonsense order scores high here and low there).
    * Bigrams are built IN-ROW (zip_with over the token array — no
    * positional self-join), counts are two map-side-combined aggregates,
    * and the per-token probability lookup is a hash join between two
    * SLIM (bigram, count) relations: at web scale the bigram vocabulary
    * shuffles rather than broadcasts and AQE picks broadcast when it
    * fits — identical shape to the unigram model. −ln p(w2|w1) =
    * −ln(c(w1 w2)/c(w1·)); ln is libm-dependent so the mean rounds to 6
    * places on both engines.
    */
  private def qBigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
    // the prefix word rides along from generation (struct element) — no
    // regex re-split of millions of bigram rows downstream
    val bgs = docs.select(col("doc_id"),
        explode(TextOps.bigramPairs(col("text"))).as("e"))
      .select(col("doc_id"), col("e.w1").as("w1"),
        concat_ws(" ", col("e.w1"), col("e.w2")).as("bg"))
    val bgc = bgs.groupBy("w1", "bg").agg(count(lit(1)).as("c"))
    val pc = bgc.groupBy("w1").agg(sum("c").as("c1"))
    val model = bgc.join(pc, "w1").select("bg", "c", "c1")
    bgs.join(model, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("c").cast("double") / col("c1"))), 6).as("surprisal"))
      .orderBy("doc_id")
  }

  /** X3 exact heavy hitters: every term above a support threshold
    * (0.2% of token occurrences) with count and relative frequency —
    * two map-side-combined aggregates and a 1-row broadcast total; the
    * corpus shuffles once, keyed by term. EntryQueriesSpec's companion
    * asserts Spark's `count_min_sketch` estimates bound these exact
    * counts within ε·N (the sketch is the constant-memory path when the
    * term universe outgrows the exact aggregate; the declared query
    * stays exact and oracle-checkable).
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = read(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val total = tf.agg(sum("c").as("n_total"))
    tf.crossJoin(broadcast(total))
      .filter(col("c") >= col("n_total") * lit(0.002))
      .select(col("term"), col("c"),
        round(col("c").cast("double") / col("n_total"), 6).as("freq"))
      .orderBy(desc("c"), col("term"))
  }

  /** X1+ blocked fuzzy entity matching (entity resolution): dirty name
    * variants (DETERMINISTICALLY planted single-char edits, so the
    * oracle rebuilds the identical dirty set) are matched back to the
    * clean customer table by edit distance — candidates come from a
    * BLOCKING-key equi-join (shared 16-char prefix), so each record
    * compares against its bounded block (≤ suffix-universe names), never
    * the whole table: candidate volume stays linear in table size, which
    * is what makes string-similarity joins feasible at warehouse scale.
    * levenshtein evaluates only on block-mates, inside codegen.
    */
  private def qFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val cust = read(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("name"))
    val dirty = cust.filter(pmod(col("k"), lit(40L)) === 1)
      .select((col("k") + 1000000L).as("k"),
        concat(substring(col("name"), 1, 17), lit("X")).as("name"))
      .union(cust.filter(pmod(col("k"), lit(40L)) === 2)
        .select((col("k") + 2000000L).as("k"),
          expr("substring(name, 1, length(name) - 1)").as("name")))
    cust.as("a").join(dirty.as("b"),
        substring(col("a.name"), 1, 16) === substring(col("b.name"), 1, 16))
      .select(col("a.k").as("base_key"), col("b.k").as("dirty_key"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= 1)
      .orderBy("base_key", "dirty_key")
  }

  /** X3 RAG-style overlapping chunking: fixed token windows (16) with
    * stride 12 — each doc map-generates its chunk list in place
    * (sequence + slice over the token array; no shuffle anywhere except
    * the presentation sort), with token offsets carried for span
    * reconstruction. At corpus scale the same expression runs with
    * 512/448-token windows; chunk count per doc is ⌈(n−w)/s⌉+1 so output
    * volume is a fixed ~w/s multiple of the input.
    */
  private def qChunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val win = 16
    val stride = 12
    val tk = TextOps.tokens(col("text"))
    val n = size(tk)
    val nChunks = when(n <= win, lit(1))
      .otherwise(ceil((n - win).cast("double") / stride).cast("int") + 1)
    read(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i =>
          struct((i * stride).cast("int").as("tok_start"),
            array_join(slice(tk, i * stride + 1, lit(win)), " ").as("chunk")))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        col("col.tok_start").as("tok_start"), col("col.chunk").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** X3 out-of-vocabulary rate: fraction of each doc's tokens outside the
    * top-k corpus vocabulary — the tokenizer-coverage diagnostic run
    * before committing to a vocab. Term frequencies are one map-side-
    * combined aggregate; the vocab ranking window is VOCABULARY-sized
    * (keyless by design — the term universe, not the corpus); the OOV
    * probe is a broadcast anti-join, so the corpus token stream never
    * shuffles for the lookup.
    */
  private def qOovRate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = read(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val vocab = tf
      .withColumn("rk", row_number().over(Window.orderBy(desc("c"), col("term"))))
      .filter(col("rk") <= 20).select("term")
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val oov = toks.join(broadcast(vocab), Seq("term"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_oov"))
    perDoc.join(oov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(coalesce(col("n_oov"), lit(0L)).cast("double") / col("n_tok"), 6)
          .as("oov_rate"))
      .orderBy("doc_id")
  }

  /** F6+ winsorization: clip a metric at its exact p05/p95 — the robust-
    * stats companion of q_zscore_outliers (clip, don't drop). One exact-
    * percentile aggregate (single 2-fraction buffer) broadcast as one
    * row; the clip itself is a map-only least/greatest over the scan.
    */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders")
    val qs = o.agg(expr("percentile(o_totalprice, array(0.05, 0.95))").as("_q"))
      .select(col("_q").getItem(0).as("lo"), col("_q").getItem(1).as("hi"))
    o.crossJoin(broadcast(qs))
      .select(col("o_orderkey"), col("o_totalprice"),
        least(greatest(col("o_totalprice"), col("lo")), col("hi")).as("clipped"),
        (col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"))
          .as("was_outlier"))
      .orderBy("o_orderkey")
  }

  /** O1+ linear interpolation of time-series gaps — the numeric upgrade
    * of forward-fill (q_ffill): missing daily values (DETERMINISTICALLY
    * planted: day-of-month ≡ 3 mod 7, so the oracle plants the same
    * holes) are rebuilt as the time-weighted blend of the nearest
    * non-null neighbors; a missing tail extrapolates to the last seen
    * value. Corpus-scale work is the daily aggregate; the interpolation
    * windows run per event_type over the CALENDAR-bounded daily table
    * and carry (value, day) pairs both directions with IGNORE NULLS
    * (one sorted pass, no self-join on time).
    */
  private def qInterpolate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(Scalar.stableSum(col("value")).as("v0"))
      .withColumn("v", when(dayofmonth(col("day")) % 7 === 3, lit(null)
        .cast("double")).otherwise(col("v0")))
    val before = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(1, Window.unboundedFollowing)
    val pv = last(col("v"), ignoreNulls = true).over(before)
    val pd = last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(before)
    val nv = first(col("v"), ignoreNulls = true).over(after)
    val nd = first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(after)
    daily
      .withColumn("filled", round(coalesce(col("v"),
        pv + (nv - pv) * (datediff(col("day"), pd).cast("double") /
          datediff(nd, pd)), pv, nv), 6))
      .select(col("event_type"), col("day"), col("v"), col("filled"))
      .orderBy("event_type", "day")
  }

  /** S6+ JSONL sink roundtrip: the events feed written as JSON lines (the
    * interchange format of every web-scraped training corpus), read back
    * with an EXPLICIT schema (a streaming/batch JSON scan must never
    * infer), aggregated — value-exact against the parquet oracle, which
    * pins both the writer's number formatting (shortest roundtrip repr)
    * and the reader's parse.
    */
  private def qSinkJsonl(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("sink_jsonl", dir)
    Tables.events(s, dir).select("event_id", "event_type", "value")
      .write.mode("overwrite").json(tmp)
    s.read.schema("event_id BIGINT, event_type STRING, value DOUBLE").json(tmp)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Scalar.stableSum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** §2.3+ second SQL-surface query (TPC-H Q3 shape): 3-relation join
    * DAG, derived revenue measure, top-10 — exercised through
    * `spark.sql` so the textual surface plans multi-joins + agg + sort +
    * limit, not just the DataFrame API. Revenue accumulates via the
    * operand-cast decimal pattern (each factor exact at its scale, exact
    * decimal product/sum — partitioning- and engine-stable; Spark plans
    * the final sort+limit as TakeOrderedAndProject, a bounded heap).
    */
  private def qSqlTopOrders(s: SparkSession, dir: String): DataFrame = {
    read(s, dir, "customer").createOrReplaceTempView("customer")
    read(s, dir, "orders").createOrReplaceTempView("orders")
    read(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    // Spark side accumulates at DECIMAL(18,6): the 18,6×18,6 product is
    // an exact DECIMAL(37,12), while 19,6×19,6 would exceed precision 38
    // and get silently ADJUSTED to (38,11) — one rounded scale digit the
    // DuckDB side (which genuinely needs 19,6; see Scalar.stableSumProdSql)
    // keeps. The asymmetry is the documented cross-engine convention.
    s.sql(
      """SELECT o.o_orderkey,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  o.o_orderdate
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** A1+ cohort retention — the canonical warehouse activity analysis:
    * each user's cohort is their first active day; the grid counts
    * distinct active users per (cohort, day-offset). Two aggregates and
    * one equi-join on user_id, all map-side combinable; the output is
    * calendar²-bounded regardless of event volume.
    */
  private def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
    ev.join(first, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("cohort", "day_offset")
  }

  /** A1+ ordered event funnel (view → click → purchase, strictly in
    * order): per-stage first-completion times via one aggregate per
    * stage + equi-joins on user_id with a time inequality — never a
    * window over the raw event stream, so each stage's shuffle carries
    * one row per surviving user. Output: one row of stage counts.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count("t1").as("n_viewed"), count("t2").as("n_clicked"),
        count("t3").as("n_purchased"))
  }

  /** X3 bigram PMI collocations: pointwise mutual information
    * ln(N·c(xy) / (c(x·)·c(·y))) over the corpus bigram counts — the
    * classic collocation detector. All three count tables are map-side-
    * combined aggregates; the prefix/suffix lookups join VOCABULARY-sized
    * relations; min-count floor keeps the estimator away from singleton
    * noise. ln rounds to 6 places (libm parity).
    */
  private def qBigramPmi(s: SparkSession, dir: String): DataFrame = {
    val bgs = read(s, dir, "documents")
      .select(explode(TextOps.bigramPairs(col("text"))).as("e"))
      .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
    val bgc = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val total = bgc.agg(sum("c").as("n_total"))
    val pre = bgc.groupBy("w1").agg(sum("c").as("c1"))
    val suf = bgc.groupBy("w2").agg(sum("c").as("c2"))
    // the marginal product goes through DOUBLE: web-scale marginals
    // (c1, c2 ~ 1e11 for stopword pairs) overflow a long product, and
    // counts are < 2^53 so the double is exact anyway
    bgc.filter(col("c") >= 5)
      .join(pre, "w1").join(suf, "w2").crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c"),
        round(log(col("c").cast("double") * col("n_total") /
          (col("c1").cast("double") * col("c2"))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(50)
  }

  /** X3 per-language adaptive length filter — multilingual pipelines
    * cannot use one absolute length cutoff (scripts differ in chars per
    * token), so each language's floor is ITS OWN p10: one exact-
    * percentile aggregate per group (language-count-sized result,
    * broadcast back), then a map-side filter over the scan. The pattern
    * generalizes to any per-group adaptive threshold.
    */
  private def qLangLengthFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = read(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val th = docs.groupBy("lang").agg(expr("percentile(n_chars, 0.10)").as("p10"))
    docs.join(broadcast(th), "lang")
      .filter(col("n_chars") >= col("p10"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** J1+ TPC-H Q5-shaped star-schema DAG through `spark.sql`: six
    * relations, a region filter that prunes through TWO dimension hops,
    * a one-year date slice on the fact table, local-supplier revenue
    * (c_nationkey = s_nationkey) per nation. The dimension chain
    * (region→nation→supplier/customer) broadcasts end-to-end; the only
    * shuffles are the fact-side equi-joins and the final tiny aggregate.
    * Revenue uses the operand-cast decimal convention (see
    * qSqlTopOrders for the 18,6-vs-19,6 asymmetry note).
    */
  private def qSqlRegionRevenue(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => read(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |             AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** A1+ event-transition matrix (first-order Markov counts): consecutive
    * event-type pairs per user via ONE user-partitioned lead() window —
    * the per-entity sort scales out by user key, never a global sort —
    * then a map-side-combinable count over the 5×5 transition space.
    * (ts, event_id) is a unique order key, so both engines sequence ties
    * identically. The session-modeling shape of product analytics.
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir).select("user_id", "event_id", "ts", "event_type")
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** A2+ distribution-drift scan — the training-data health check that
    * catches a source whose event mix shifted between ingestion windows:
    * PSI (population stability index) of the event-type distribution,
    * first half vs second half of the stream by event time. Corpus-scale
    * work is one min/max aggregate (1 row, broadcast back) and one
    * map-side-combinable per-type conditional count — a single shuffle
    * on event_type; the share/log arithmetic runs on the
    * vocabulary-sized table. The 1e-6 floor is the standard PSI guard
    * for a type absent from one window; shares divide long counts as
    * IEEE doubles identically in both engines, rounded to 6dp.
    */
  private def qDriftPsi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val piv = ev.agg(expr("(min(us) + max(us)) div 2").as("pv"))
    val byType = ev.crossJoin(broadcast(piv))
      .groupBy("event_type")
      .agg(
        sum(when(col("us") <= col("pv"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("us") > col("pv"), 1L).otherwise(0L)).as("n2"))
    val tot = byType.agg(sum("n1").as("t1"), sum("n2").as("t2"))
    val p = greatest(col("n1") / col("t1"), lit(1e-6))
    val q = greatest(col("n2") / col("t2"), lit(1e-6))
    byType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n1"), col("n2"),
        round((p - q) * log(p / q), 6).as("psi"))
      .orderBy("event_type")
  }

  /** X3 BM25 lexical relevance — Robertson/Sparck-Jones scoring of every
    * doc against a fixed query-term set, shaped so NOTHING scales with the
    * corpus except map work: per-doc term frequencies come straight off the
    * token array (tf = dl − |array_remove(toks, t)|, codegen'd — no
    * explode, no (doc, term) shuffle), the corpus statistics (N, Σdl,
    * per-term df) are ONE combinable aggregate broadcast back as a single
    * row, and the top-20 is a bounded-heap TakeOrderedAndProject. The lone
    * exchange is the 1-row stats agg. Integer tf/dl/df feed a closed-form
    * double score with identical op order on both engines; ln() crosses
    * libm, so scores round at 6dp BEFORE ranking, doc_id breaking ties.
    * k1 = 1.2, b = 0.75 (the standard defaults); constants are written as
    * decimal literals on both sides so each engine parses the same double
    * (1.2 + 1.0 in binary is NOT the literal 2.2).
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "vector", "window")
    val d = read(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val tf = qTerms.foldLeft(d) { (acc, t) =>
      acc.withColumn(s"tf_$t", col("dl") - size(array_remove(col("toks"), t)))
    }.drop("toks")
    val statAggs = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")) ++
      qTerms.map(t => sum((col(s"tf_$t") > 0).cast("long")).cast("double").as(s"df_$t"))
    val stats = tf.agg(statAggs.head, statAggs.tail: _*)
    val score = qTerms.map { t =>
      val tfc = col(s"tf_$t")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      idf * (tfc * lit(2.2)) /
        (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(20)
  }

  /** DQ filter-cascade audit — the per-stage attrition report every corpus
    * curation pipeline publishes (C4/FineWeb-style): each doc is attributed
    * to its FIRST failing rule (length floor → allowed-language set →
    * distinct-token repetition ratio), so stage counts are additive and sum
    * to the corpus. Every predicate is map-side column arithmetic — the
    * repetition ratio reads |array_distinct(toks)| / |toks| off the token
    * array with no explode — and the only shuffle is the (source × stage)-
    * sized combinable count. The ratio divides two small ints as IEEE
    * doubles, bit-identical cross-engine.
    */
  private def qFilterCascade(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val stage = when(col("n_chars") < 150, "too_short")
      .when(!col("lang").isInCollection(Seq("en", "es", "de", "fr")), "lang_excluded")
      .when(size(array_distinct(toks)).cast("double") / size(toks) < 0.35, "repetitive")
      .otherwise("kept")
    read(s, dir, "documents")
      .withColumn("stage", stage)
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "stage")
  }

  /** A2+ equi-depth histogram — the optimizer-statistics counterpart to
    * q_histogram's equi-width bins: boundaries at the exact deciles (one
    * 9-fraction percentile aggregate, broadcast as a single row), bucket
    * assignment as nine codegen'd comparisons against the broadcast
    * array (NOT an `aggregate` HOF — higher-order lambdas run
    * interpreted, the q_embed_gram lesson). Map-side bucket + one
    * map-side-combinable aggregate; ~equal counts per bucket by
    * construction, boundary ties going low.
    */
  private def qEquidepth(s: SparkSession, dir: String): DataFrame = {
    val o = read(s, dir, "orders").select(col("o_totalprice").as("v"))
    val fracs = (1 to 9).map(i => s"0.$i").mkString(", ")
    val bounds = o.agg(expr(s"percentile(v, array($fracs))").as("bs"))
    val bucket = (1 to 9)
      .map(i => (col("v") > element_at(col("bs"), i)).cast("int"))
      .reduce(_ + _)
    o.join(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("bucket")
  }

  /** A2+ exact weighted median (quantity-weighted price per return flag):
    * the first value whose cumulative weight reaches half the group
    * total. Two-phase so the cumulative pass never sees the fact table:
    * weights pre-aggregate per (group, value) — map-side combinable,
    * corpus-scale — and the cumulative sum runs over the distinct-value
    * table via Ordered.groupedPrefixSum: range-partitioned on (group,
    * value) with broadcast per-group offsets, so its parallelism is the
    * PARTITION count, not the 3-value group count a
    * `Window.partitionBy(group)` would pin it to (distinct prices grow
    * with data; three single-thread sort tasks do not). (group, value)
    * is unique by construction, so the inclusive cumsum is exactly the
    * tie-free RANGE window, and decimal accumulation keeps the
    * threshold test exact on both engines.
    */
  private def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    // Weights as LONG micro-units (quantities are integer-valued, so
    // floor(q*1e6) is exact): integer accumulation keeps the 2·cum >= tot
    // test bit-identical cross-engine like decimal did, but stays inside
    // whole-stage codegen through the agg, window, and compare.
    // Eager checkpoint: groupedPrefixSum's repartitionByRange SAMPLES its
    // input before exchanging it — an unmaterialized wv would run the
    // fact-table aggregate twice (sample pass + exchange pass); it also
    // makes the totals aggregate below a cheap re-scan instead of a
    // second window-chain execution.
    val wv = read(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(sum(floor(col("l_quantity") * lit(1000000.0)).cast("long")).as("w"))
      .localCheckpoint()
    val cum = graft.ops.Ordered.groupedPrefixSum(
      wv, Seq("l_returnflag"), Seq(col("v")), col("w"), "cw")
    val tot = wv.groupBy("l_returnflag").agg(sum("w").as("tw"))
    cum.join(broadcast(tot), "l_returnflag")
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("l_returnflag").agg(min("v").as("weighted_median"))
      .orderBy("l_returnflag")
  }

  /** S1+ schema-evolution scan: two parquet batches written with DRIFTED
    * schemas (the later batch adds o_orderpriority) read back through ONE
    * `mergeSchema=true` scan — the production reality of long-lived table
    * directories where columns appear mid-stream. Rows from the old batch
    * null-fill the new column; aggregating BY that column proves the
    * union-by-name semantics end-to-end. The batch= subdirs double as a
    * discovered partition column. At 100 TB mergeSchema's footer sampling
    * is the cost knob — schema drift is per-batch, so sampling stays
    * cheap; the scan itself remains one pass.
    */
  private def qScanEvolved(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("evolve", dir)
    val o = read(s, dir, "orders")
    val cutoff = lit("1998-01-01").cast("timestamp")
    o.filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    // NULL dates route to the v2 batch (matching the oracle's CASE, where
    // a NULL date falls through to the real priority) — a bare >= would
    // silently drop them from BOTH batches
    o.filter(col("o_orderdate") >= cutoff || col("o_orderdate").isNull)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Scalar.stableSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  /** X3 token-budget apportionment (largest-remainder / Hamilton method):
    * split a fixed training-token budget across (lang, source) groups
    * proportionally to their corpus mass, with the rounding leftover
    * going one unit each to the largest remainders — allocations sum to
    * EXACTLY the budget (spec-asserted) and every group is within one
    * token of its real quota. All integer arithmetic (div/mod against the
    * grand total), so bit-exact cross-engine; headroom bound: budget ×
    * grand-total must stay below 2^63 — normalize weights first at
    * corpus scales beyond that. Corpus-scale work is ONE map-side-
    * combinable aggregate; everything after runs on the group-count-sized
    * table (the rank window is keyless but group-bounded, like
    * q_oov_rate's vocabulary window).
    */
  private def qBudgetAlloc(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000000L
    val g = read(s, dir, "documents").groupBy("lang", "source")
      .agg(sum("n_chars").as("w"))
    val tot = g.agg(sum("w").as("tw"))
    val base = g.join(broadcast(tot))
      .withColumn("base", expr(s"($budget * w) div tw"))
      .withColumn("rem", expr(s"($budget * w) % tw"))
    val left = base.agg((lit(budget) - sum("base")).as("leftover"))
    base.join(broadcast(left))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("lang"), col("source"))))
      .select(col("lang"), col("source"), col("w"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("lang", "source")
  }

  /** X2 int8-quantized ANN: brute-force top-k by INTEGER dot product over
    * the quantized vectors (Similarity.topkInt8) — 4× less scan/shuffle
    * bandwidth than float cosine and a bit-exact ranking (no float in the
    * score), the standard memory-bound trade of production vector search.
    */
  private def qAnnInt8(s: SparkSession, dir: String): DataFrame =
    Similarity.topkInt8(read(s, dir, "embeddings"), queryId = 0L, k = 10)

  /** X1 content-defined chunking: Rabin/FastCDC-style boundaries from the
    * portable token hash (h ≡ 0 mod 8 ends a chunk, expected length 8
    * tokens) — edit-robust chunk dedup units, unlike fixed windows
    * (Dedup.cdcChunks). Every step is DuckDB-replicable: portable hash,
    * prefix-sum window, ordered string_agg rebuild.
    */
  private def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcChunks(read(s, dir, "documents"), avgTokens = 8)
      .orderBy("doc_id", "chunk_id")

  /** A1+ market-basket co-occurrence (frequent pairs): top co-purchased
    * part pairs by order support. The pair explode happens IN-ROW on each
    * order's sorted distinct-part list, so the blowup is bounded by the
    * basket size squared (TPC-H baskets are ≤7 lines) — never a corpus
    * self-join; one shuffle to build baskets, one map-side-combinable
    * count, then a bounded-heap top-k (TakeOrderedAndProject).
    */
  private def qCopurchase(s: SparkSession, dir: String): DataFrame =
    basketPairs(read(s, dir, "lineitem"))
      .select(col("pa").as("part_a"), col("pb").as("part_b"), col("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(50)

  /** Canonical (pa < pb) part pairs per order with their support count —
    * the one definition both basket consumers (frequent pairs, triangle
    * enumeration) share. In-row pair explode over the sorted basket:
    * blowup bounded by basket size², never a corpus self-join.
    */
  private def basketPairs(li: DataFrame): DataFrame = {
    val lists = li.select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_orderkey").agg(sort_array(collect_set("l_partkey")).as("ps"))
    val combos = filter(
      flatten(transform(col("ps"),
        a => transform(col("ps"), b => struct(a.as("pa"), b.as("pb"))))),
      p => p("pa") < p("pb"))
    lists.select(explode(combos).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("support"))
  }

  /** X4 triangle enumeration on the support-≥2 co-purchase graph — the
    * clustering-structure probe of graph analytics, in the classic
    * distributed formulation: ORIENTED edges (a < b canonically) make
    * each triangle appear exactly once as x(a,b)⋈y(b,c)⋈z(a,c), so the
    * whole enumeration is two equi-joins on node ids — no wedge explosion
    * beyond the real wedge count, no cartesian anywhere. The edge list is
    * localCheckpoint'd once and consumed three times.
    */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val edges = basketPairs(read(s, dir, "lineitem"))
      .filter(col("support") >= 2)
      .select(col("pa").as("a"), col("pb").as("b"))
      .localCheckpoint()
    edges.as("x")
      .join(edges.as("y"), col("x.b") === col("y.a"))
      .join(edges.as("z"), col("z.a") === col("x.a") && col("z.b") === col("y.b"))
      .select(col("x.a").as("p1"), col("x.b").as("p2"), col("y.b").as("p3"))
      .orderBy("p1", "p2", "p3")
  }

  /** DQ one-pass table profile: per-column nulls, exact distinct counts,
    * numeric min/max — single aggregation over the scan, unpivoted to a
    * (col_name, metric, value) triple table (ops/Profile.scala for the
    * Expand trade-off at scale).
    */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(read(s, dir, "orders"),
      numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      otherCols = Seq("o_orderstatus", "o_orderpriority"))

  /** A2+ robust outlier detection via median/MAD — the standard
    * contamination-resistant alternative to z-scores (one wild day shifts
    * a mean + stddev, not a median + MAD). Daily activity counts per
    * event type; a day is an outlier when |cnt − median| > 3·MAD. Exact
    * percentiles over INTEGER counts: the interpolated midpoints are
    * dyadic rationals, exact in double on both engines, so the flag
    * itself is bit-stable. Aggregation is corpus-scale; the median/MAD
    * tables are group-count-sized and broadcast back.
    */
  private def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val med = daily.groupBy("event_type").agg(expr("percentile(cnt, 0.5)").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("cnt") - col("med")))
    val mad = dev.groupBy("event_type").agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("is_outlier", (col("adev") > lit(3.0) * col("mad")).cast("int"))
      .select("event_type", "day", "cnt", "med", "mad", "is_outlier")
      .orderBy("event_type", "day")
  }

  /** X4 link-graph PageRank — the web-pipeline quality prior (hosts are
    * ranked by link centrality before corpus sampling; Common Crawl's
    * harmonic-centrality host ranking is the published instance). The graph
    * here is the symmetrized customer↔supplier purchase graph (customer
    * node ids offset by 1e6 to disambiguate the two key spaces); 4 damped
    * iterations in fixed-point BIGINT micro-units, so every step — and
    * therefore the oracle's unrolled replay — is bit-identical
    * (graph/PageRank.scala for the scale shape).
    */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val o = read(s, dir, "orders")
    val e0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") + lit(1000000L)).as("c"), col("l_suppkey").as("sup"))
      .distinct()
    val edges = e0.select(col("c").as("src"), col("sup").as("dst"))
      .union(e0.select(col("sup").as("src"), col("c").as("dst")))
    PageRank.ranks(edges, iters = 4)
      .select(col("id").as("node_id"), col("r").as("rank_micro"), col("unit"))
      .orderBy(col("rank_micro").desc, col("node_id"))
  }

  /** X4 bounded-depth BFS hop distances (graph/Bfs) on the same
    * symmetrized purchase graph as q_pagerank, seeded at supplier node 1
    * — frontier-based (each edge traversed once per endpoint discovery,
    * O(E) total, not O(E·depth)), exact BIGINT distances replayed by an
    * unrolled min-union oracle.
    */
  private def qBfsHops(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val o = read(s, dir, "orders")
    val e0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") + lit(1000000L)).as("c"), col("l_suppkey").as("sup"))
      .distinct()
    val edges = e0.select(col("c").as("src"), col("sup").as("dst"))
      .union(e0.select(col("sup").as("src"), col("c").as("dst")))
    graft.graph.Bfs.hops(edges, seed = 1L, maxHops = 4)
      .select(col("id").as("node_id"), col("d").as("hops"))
      .orderBy("node_id")
  }

  /** X4 bounded Bellman-Ford cheapest paths (graph/Bfs.cheapest) —
    * edge cost = 1000000 div interaction-count (strongly-traded
    * customer↔supplier pairs are CLOSE), so the result ranks partners by
    * relationship cost within 4 hops of supplier node 1. Full min-union
    * relaxation per round (a node's cost can improve after first reach —
    * the frontier trick is BFS-only); exact BIGINT, unrolled oracle.
    */
  private def qCheapestPath(s: SparkSession, dir: String): DataFrame = {
    val li = read(s, dir, "lineitem")
    val o = read(s, dir, "orders")
    val ecnt = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy((col("o_custkey") + lit(1000000L)).as("c"),
        col("l_suppkey").as("sup"))
      .agg(count(lit(1)).as("cnt"))
    val w = expr("1000000 div cnt")
    val edges = ecnt.select(col("c").as("src"), col("sup").as("dst"), w.as("w"))
      .union(ecnt.select(col("sup").as("src"), col("c").as("dst"), w.as("w")))
    graft.graph.Bfs.cheapest(edges, seed = 1L, rounds = 4)
      .select(col("id").as("node_id"), col("d").as("cost"))
      .orderBy("node_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_csv" -> (qScanCsv _),
    "q_scan_xlsx" -> (qScanXlsx _),
    "q_json_records" -> (qJsonRecords _),
    "q_union_batches" -> (qUnionBatches _),
    "q_sink_roundtrip" -> (qSinkRoundtrip _),
    "q_sink_partitioned" -> (qSinkPartitioned _),
    "q_project" -> (qProject _),
    "q_drop_col" -> (qDropCol _),
    "q_filter_eq" -> (qFilterEq _),
    "q_filter_contains" -> (qFilterContains _),
    "q_filter_strlen" -> (qFilterStrlen _),
    "q_rows_by_ordinal" -> (qRowsByOrdinal _),
    "q_join_inner" -> (qJoinInner _),
    "q_join_full_outer" -> (qJoinFullOuter _),
    "q_mart_assembly" -> ((s: SparkSession, dir: String) => Marts.martAssembly(s, dir)),
    "q_asof_join" -> (qAsofJoin _),
    "q_unpivot" -> (qUnpivot _),
    "q_pivot" -> (qPivot _),
    "q_groupby_avg" -> (qGroupbyAvg _),
    "q_sql_pricing_summary" -> (qSqlPricingSummary _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_distinct_count" -> (qDistinctCount _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_quantiles" -> (qQuantiles _),
    "q_str_qswap" -> (qStrQswap _),
    "q_regex_strip" -> (qRegexStrip _),
    "q_parse_number" -> (qParseNumber _),
    "q_pct_ratio" -> (qPctRatio _),
    "q_derived_ratio" -> (qDerivedRatio _),
    "q_date_parse" -> (qDateParse _),
    "q_to_quarter" -> (qToQuarter _),
    "q_date_arith" -> (qDateArith _),
    "q_set_ops" -> (qSetOps _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_null_handling" -> (qNullHandling _),
    "q_ffill" -> (qFfill _),
    "q_fill_down" -> (qFillDown _),
    "q_window_analytics" -> (qWindowAnalytics _),
    "q_sessionize" -> (qSessionize _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_multibatch" -> (qDedupMultibatch _),
    "q_ingest_stream" -> (qIngestStream _),
    "q_groups_incremental" -> (qGroupsIncremental _),
    "q_simhash" -> (qSimhash _),
    "q_topk_cosine" -> (qTopkCosine _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_dedup_embed_groups" -> (qDedupEmbedGroups _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ivf_topk" -> (qIvfTopk _),
    "q_kmeans_lloyd" -> (qKmeansLloyd _),
    "q_ivf_refined" -> (qIvfRefined _),
    "q_ivf_incremental" -> (qIvfIncremental _),
    "q_stream_ivf" -> (qStreamIvf _),
    "q_stream_kmeans" -> (qStreamKmeans _),
    "q_semdedup" -> (qSemDedup _),
    "q_embed_norms" -> (qEmbedNorms _),
    "q_token_count" -> (qTokenCount _),
    "q_lang_id" -> (qLangId _),
    "q_quality_score" -> (qQualityScore _),
    "q_repetition_ratio" -> (qRepetitionRatio _),
    "q_mix_weights" -> (qMixWeights _),
    "q_vocab_topk" -> (qVocabTopk _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_token_zipf" -> (qTokenZipf _),
    "q_source_cap_sample" -> (qSourceCapSample _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_doc_fingerprint" -> (qDocFingerprint _),
    "q_rolling_fingerprint" -> (qRollingFingerprint _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_frames" -> (qMediaFrames _),
    "q_dedup_groups" -> (qDedupGroups _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_corr_stats" -> (qCorrStats _),
    "q_tfidf" -> (qTfidf _),
    "q_join_semi_anti" -> (qJoinSemiAnti _),
    "q_histogram" -> (qHistogram _),
    "q_zscore_outliers" -> (qZscoreOutliers _),
    "q_sample_hash" -> (qSampleHash _),
    "q_range_join" -> (qRangeJoin _),
    "q_collect_agg" -> (qCollectAgg _),
    "q_scan_jsonl" -> (qScanJsonl _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_window_ranks" -> (qWindowRanks _),
    "q_month_spine" -> (qMonthSpine _),
    "q_skew_salted" -> (qSkewSalted _),
    "q_map_pivot" -> (qMapPivot _),
    "q_join_bucketed" -> (qJoinBucketed _),
    "q_stream_quarterly" -> (qStreamQuarterly _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_regex_extract" -> (qRegexExtract _),
    "q_minmax_by" -> (qMinmaxBy _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_global_ids" -> (qGlobalIds _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_scan_orc" -> (qScanOrc _),
    "q_stream_sessionize" -> (qStreamSessionize _),
    "q_text_normalize" -> (qTextNormalize _),
    "q_line_dedup" -> (qLineDedup _),
    "q_dup_spans" -> (qDupSpans _),
    "q_seq_pack" -> (qSeqPack _),
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_skew_join_salted" -> (qSkewJoinSalted _),
    "q_unigram_logprob" -> (qUnigramLogprob _),
    "q_sink_upsert" -> (qSinkUpsert _),
    "q_token_entropy" -> (qTokenEntropy _),
    "q_ewma_daily" -> (qEwmaDaily _),
    "q_ann_batch" -> (qAnnBatch _),
    "q_stream_enrich" -> (qStreamEnrich _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_scd2" -> (qScd2 _),
    "q_cdc_merge" -> (qCdcMerge _),
    "q_bloom_join" -> (qBloomJoin _),
    "q_embed_gram" -> (qEmbedGram _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_window_distribution" -> (qWindowDistribution _),
    "q_zorder_key" -> (qZorderKey _),
    "q_stream_join" -> (qStreamJoin _),
    "q_bigram_logprob" -> (qBigramLogprob _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_chunk_overlap" -> (qChunkOverlap _),
    "q_oov_rate" -> (qOovRate _),
    "q_winsorize" -> (qWinsorize _),
    "q_interpolate" -> (qInterpolate _),
    "q_sink_jsonl" -> (qSinkJsonl _),
    "q_sql_top_orders" -> (qSqlTopOrders _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_funnel" -> (qFunnel _),
    "q_bigram_pmi" -> (qBigramPmi _),
    "q_lang_length_filter" -> (qLangLengthFilter _),
    "q_pagerank" -> (qPagerank _),
    "q_bfs_hops" -> (qBfsHops _),
    "q_cheapest_path" -> (qCheapestPath _),
    "q_jaccard_prefix" -> (qJaccardPrefix _),
    "q_profile" -> (qProfile _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_sql_region_revenue" -> (qSqlRegionRevenue _),
    "q_copurchase" -> (qCopurchase _),
    "q_cdc_chunks" -> (qCdcChunks _),
    "q_ann_int8" -> (qAnnInt8 _),
    "q_budget_alloc" -> (qBudgetAlloc _),
    "q_triangles" -> (qTriangles _),
    "q_scan_evolved" -> (qScanEvolved _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_containment" -> (qContainment _),
    "q_equidepth" -> (qEquidepth _),
    "q_transitions" -> (qTransitions _),
    "q_drift_psi" -> (qDriftPsi _),
    "q_bm25" -> (qBm25 _),
    "q_filter_cascade" -> (qFilterCascade _)
  )

  // DuckDB spellings of the portable hash family (TextOps.portableHash /
  // mixRound / mixedHash) — shared by the dedup/fingerprint/ANN oracles.
  // greatest(ord(c),0) aligns DuckDB's ord('') = -1 with Spark ascii('') = 0.
  private def polySql(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($v,''), c -> CAST(greatest(ord(c),0) AS BIGINT))), " +
      s"(acc,x) -> (acc*31+x) % ${TextOps.HashMod})"
  private def mixSql(h: String, mult: Long): String =
    s"( ((xor($h, ($h) >> 16)) * $mult) % ${TextOps.HashMod} )"
  private def mixedSql(v: String, mult: Long = TextOps.DefaultMixMult): String =
    mixSql(mixSql(s"(${polySql(v)})", mult), mult)

  /** DuckDB cosine in the left-fold form verified bit-equal to the
    * CosineSim codegen kernel (SURVEY.md §5; never list_cosine_similarity,
    * which is float-internal).
    */
  private def cosSql(a: String, b: String): String =
    s"(list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) " +
      s"/ (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) " +
      s"* sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))))"

  /** Shared fixed-point-Lloyd CTE chain (mirrors Similarity.kmeansFixedFull
    * step for step): pts = quantize-and-shift (the +1000000 makes every
    * value non-negative so DuckDB's flooring `//` and Spark's truncating
    * `div` agree), seeds = the k lowest vec_ids, then per iteration
    * dK (squared-L2 in BIGINT — DuckDB SUM(BIGINT) widens to HUGEINT,
    * hence the CASTs), aK (argmin, ties to lowest cluster), cK
    * (integer-mean update). Ends with aF = the final assignment
    * (vec_id, cluster, dist) against c{iters}. Reused by the
    * q_kmeans_lloyd and q_ivf_refined oracles.
    */
  private def kmeansOracleCtes(k: Int, iters: Int,
                               src: String = "SELECT * FROM embeddings"): String = {
    val loop = (1 to iters).map { i =>
      s"""d$i AS (
         |  SELECT p.vec_id, c.cluster,
         |    CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS dist
         |  FROM pts p JOIN c${i - 1} c ON p.pos = c.pos GROUP BY 1, 2),
         |a$i AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |    FROM d$i) WHERE rn = 1),
         |c$i AS (
         |  SELECT a.cluster, p.pos, CAST(SUM(p.e) // COUNT(*) AS BIGINT) AS c
         |  FROM pts p JOIN a$i a ON p.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""pts AS (
       |  SELECT vec_id, CAST(i AS INTEGER) AS pos,
       |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
       |      + 1000000 AS e
       |  FROM ($src) CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
       |seeds AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
       |  FROM (SELECT vec_id FROM ($src) ORDER BY vec_id LIMIT $k)),
       |c0 AS (
       |  SELECT s.cluster, p.pos, p.e AS c
       |  FROM pts p JOIN seeds s ON p.vec_id = s.vec_id),
       |$loop,
       |dF AS (
       |  SELECT p.vec_id, c.cluster,
       |    CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS dist
       |  FROM pts p JOIN c$iters c ON p.pos = c.pos GROUP BY 1, 2),
       |aF AS (
       |  SELECT vec_id, cluster, dist FROM (
       |    SELECT vec_id, cluster, dist,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |    FROM dF) WHERE rn = 1)""".stripMargin
  }

  /** Refined-IVF oracle on top of [[kmeansOracleCtes]]: probe = nprobe
    * lowest fixed-point squared-L2 centroid distances from the query's
    * quantized vector (ties to lowest cluster), then exact cosine
    * re-rank of the probed lists — mirrors Similarity.ivfTopkFixed step
    * for step, including cosSql's left-fold form. Parameterized so
    * q_ivf_topk and q_ivf_refined check DISTINCT operating points
    * (refinement depth, probe width) of the one IVF implementation.
    */
  private def ivfFixedOracleSql(k: Int, iters: Int, nprobe: Int,
                                queryId: Long, limit: Int): String =
    s"""WITH ${kmeansOracleCtes(k = k, iters = iters)},
       |qp AS (SELECT pos, e FROM pts WHERE vec_id = $queryId),
       |probe AS (
       |  SELECT cluster FROM (
       |    SELECT c.cluster, SUM((p.e - c.c) * (p.e - c.c)) AS qdist
       |    FROM qp p JOIN c$iters c ON p.pos = c.pos GROUP BY 1)
       |  ORDER BY qdist, cluster LIMIT $nprobe),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryId)
       |SELECT e.vec_id, ${cosSql("e.embedding", "q.qe")} AS sim
       |FROM embeddings e JOIN aF a ON e.vec_id = a.vec_id CROSS JOIN q
       |WHERE a.cluster IN (SELECT cluster FROM probe) AND e.vec_id <> $queryId
       |ORDER BY sim DESC, e.vec_id LIMIT $limit""".stripMargin

  /** Shared bucket prefix of the banded-LSH oracles: portable planes
    * regenerated in SQL → per-band 2-bit buckets (`wb`) → exploded
    * (vec_id, band, bkt) rows (`bd`). Reused by the near-dup pair oracles
    * AND the batched-ANN oracle, which build different joins on top.
    */
  private lazy val embedBucketCtes: String =
    s"""wb AS (
       |  SELECT vec_id, embedding,
       |    list_transform(range(0,8), j ->
       |      list_sum(list_transform(range(0,2), r -> CASE WHEN
       |        list_sum(list_transform(range(1,65),
       |          dd -> CAST(embedding[dd] AS DOUBLE) *
       |            (CASE WHEN (${mixSql(mixSql("(j*2+r)*65537 + (dd-1) + 1", TextOps.DefaultMixMult), TextOps.DefaultMixMult)}) & 1 = 1
       |             THEN 1.0 ELSE -1.0 END)))
       |        > 0 THEN (1 << r) ELSE 0 END))) AS buckets
       |  FROM embeddings
       |), bd AS (
       |  SELECT vec_id, j AS band, buckets[j+1] AS bkt
       |  FROM wb CROSS JOIN (SELECT unnest(range(0,8)) AS j)
       |)""".stripMargin

  /** Shared banded-LSH CTEs for the embedding near-dup oracles: the bucket
    * prefix above → candidate equi-join → exact cosine verify.
    * `epairs(vec_a, vec_b, sim)` is the verified pair list both
    * q_dedup_embed and q_dedup_embed_groups read.
    */
  private lazy val embedBandedCtes: String =
    s"""$embedBucketCtes, cands AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bd a JOIN bd b ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id
       |), epairs AS (
       |  SELECT vec_a, vec_b, sim FROM (
       |    SELECT c.vec_a, c.vec_b, ${cosSql("a.embedding", "b.embedding")} AS sim
       |    FROM cands c JOIN embeddings a ON c.vec_a = a.vec_id
       |                 JOIN embeddings b ON c.vec_b = b.vec_id)
       |  WHERE sim > 0.4
       |)""".stripMargin

  /** Shared CC prefix (stop-shingle-filtered shingles → Jaccard ≥ 0.5
    * edges → recursive-CTE transitive closure → `groups(doc_id,
    * group_id)`), used by the q_dedup_groups and q_dedup_keep_best
    * oracles. The df cap mirrors Dedup.ngramJaccardPairs' stop-shingle
    * filter exactly.
    */
  private val dedupGroupsCte: String =
    s"""WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
      |), shall AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS s
      |  FROM toks
      |), keep AS (
      |  SELECT s FROM shall GROUP BY s HAVING COUNT(*) <= ${Dedup.DefaultMaxShingleDf}
      |), sh AS (
      |  SELECT shall.doc_id, shall.s FROM shall JOIN keep USING (s)
      |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
      |    FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
      |  WHERE jaccard >= 0.5
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), reach AS (
      |  SELECT doc_id, doc_id AS r FROM documents
      |  UNION
      |  SELECT e.src AS doc_id, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
      |), groups AS (
      |  SELECT doc_id, MIN(r) AS group_id FROM reach GROUP BY doc_id
      |)""".stripMargin

  /** Full-corpus minhash-LSH pair graph → connected-component labels,
    * recomputed from scratch: the q_minhash_lsh portable-hash CTE chain
    * plus a recursive-CTE closure. CC is associative over edge union, so
    * this one SQL is the oracle for EVERY batching of the same corpus —
    * the single-batch fold (q_groups_incremental) and the streamed
    * multi-batch loop (q_ingest_stream) both converge to it.
    */
  private lazy val lshGroupsOracle: String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS s
       |  FROM toks
       |), hs AS (SELECT doc_id, s, ${mixedSql("s")} AS hs FROM sh),
       |sig AS (
       |  SELECT doc_id, i, MIN(((2*i+1)*hs + 12345*i+1) % 2147483647) AS h
       |  FROM hs CROSS JOIN (SELECT unnest(range(0,16)) AS i) GROUP BY doc_id, i
       |), bands AS (
       |  SELECT doc_id, i // 4 AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY i)),
       |      (acc, x) -> (acc*1000003 + x) % 2147483647) AS bh
       |  FROM sig GROUP BY doc_id, i // 4
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |common AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
       |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
       |  WHERE (x.doc_id, y.doc_id) IN (SELECT (doc_a, doc_b) FROM cands)
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
       |    FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
       |  WHERE jaccard >= 0.5
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       |  SELECT doc_id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.src AS doc_id, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id
       |)
       |SELECT doc_id, MIN(r) AS group_id FROM reach GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_scan_csv" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_scan_xlsx" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_json_records" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events ORDER BY event_id",
    "q_union_batches" ->
      "SELECT * FROM events ORDER BY event_id",
    "q_sink_roundtrip" ->
      "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY 1 ORDER BY 1",
    "q_sink_partitioned" ->
      """SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
        |  l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY 1, 2 ORDER BY Quarter""".stripMargin,
    "q_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_drop_col" ->
      "SELECT p_partkey, p_name, p_brand, p_type FROM part ORDER BY p_partkey",
    "q_filter_eq" ->
      "SELECT * FROM customer WHERE c_mktsegment <> 'BUILDING' ORDER BY c_custkey",
    "q_filter_contains" ->
      "SELECT * FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey",
    "q_filter_strlen" ->
      "SELECT * FROM nation WHERE length(n_name) <> 4 ORDER BY n_nationkey",
    "q_rows_by_ordinal" ->
      """SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS INTEGER) AS _idx,
        |         o_orderkey, o_totalprice
        |  FROM orders)
        |WHERE _idx IN (5,6,17,18,19) OR _idx BETWEEN 100 AND 120
        |ORDER BY _idx""".stripMargin,
    "q_join_inner" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, c_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_full_outer" ->
      s"""WITH gdp AS (
         |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |    ${sa("o_totalprice")} AS avg_price FROM orders GROUP BY 1
         |), infl AS (
         |  SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |    ${sa("l_quantity")} AS avg_qty FROM lineitem GROUP BY 1
         |), flow AS (
         |  SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |    ${ss("l_extendedprice")} AS r_revenue
         |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
         |), shock AS (
         |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |    COUNT(*) AS n_urgent FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
         |)
         |SELECT Quarter, avg_price, avg_qty, r_revenue, n_urgent
         |FROM gdp FULL JOIN infl USING (Quarter)
         |FULL JOIN flow USING (Quarter) FULL JOIN shock USING (Quarter)
         |ORDER BY Quarter""".stripMargin,
    "q_mart_assembly" -> Marts.martAssemblySql,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value,
        |  p.value AS last_purchase_value
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts, max(value) AS value FROM events
        |   WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_unpivot" ->
      s"""WITH wide AS (
         |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |    ${sa("o_totalprice")} AS avg_price,
         |    ${ss("o_totalprice")} AS sum_price,
         |    CAST(COUNT(*) AS DOUBLE) AS n_orders
         |  FROM orders GROUP BY 1
         |)
         |SELECT Quarter, metric, value FROM (
         |  SELECT Quarter, 'avg_price' AS metric, avg_price AS value FROM wide
         |  UNION ALL SELECT Quarter, 'sum_price', sum_price FROM wide
         |  UNION ALL SELECT Quarter, 'n_orders', n_orders FROM wide)
         |ORDER BY Quarter, metric""".stripMargin,
    "q_pivot" ->
      """SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS A,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS N,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS R
        |FROM lineitem GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_groupby_avg" ->
      s"""SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |  ${sa("o_totalprice")} AS avg_price,
         |  COUNT(o_orderkey) AS n_orders
         |FROM orders GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_sql_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk_per_group" ->
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS INTEGER) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q_distinct_count" ->
      """SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_quantiles" ->
      """SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90
        |FROM orders GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_str_qswap" ->
      """WITH r AS (
        |  SELECT DISTINCT 'Q' || quarter(o_orderdate) || '/' || year(o_orderdate) AS raw
        |  FROM orders)
        |SELECT raw, regexp_replace(raw, '^Q(\d)/(\d{4})$', '\2-Q\1') AS swapped
        |FROM r ORDER BY swapped""".stripMargin,
    "q_regex_strip" ->
      """SELECT p_partkey,
        |  p_brand || CASE WHEN p_size % 2 = 0 THEN ' p' ELSE ' r1' END AS raw,
        |  trim(regexp_replace(raw, '\s*(r1|p1|r|p)$', '')) AS clean
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_parse_number" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey // 1000 AS VARCHAR) || ',' ||
        |    lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') AS fmt,
        |  CAST(replace(fmt, ',', '') AS BIGINT) AS parsed
        |FROM orders WHERE o_orderkey >= 1000 ORDER BY o_orderkey""".stripMargin,
    "q_pct_ratio" ->
      """SELECT p_partkey, CAST(p_size AS VARCHAR) AS pct_str,
        |  CAST(CAST(p_size AS VARCHAR) AS DOUBLE) / 100 AS ratio
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_derived_ratio" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_rev,
        |  l_extendedprice / (1.0 + l_tax) AS pre_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_date_parse" ->
      """WITH r AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%-d/%-m/%Y') AS raw FROM orders)
        |SELECT raw, strptime(raw, '%-d/%-m/%Y')::DATE AS parsed
        |FROM r ORDER BY parsed""".stripMargin,
    "q_to_quarter" ->
      """SELECT DISTINCT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
        |  date_trunc('quarter', l_shipdate) AS q_start
        |FROM lineitem ORDER BY Quarter""".stripMargin,
    "q_date_arith" ->
      """SELECT DISTINCT
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY, '%Y-%m-%d') AS month_end,
        |  strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_start
        |FROM orders ORDER BY month_start""".stripMargin,
    "q_set_ops" ->
      """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     r AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT c_custkey, op FROM (
        |  SELECT c_custkey, 'both' AS op FROM (SELECT * FROM b INTERSECT SELECT * FROM r)
        |  UNION ALL
        |  SELECT c_custkey, 'building_only' FROM (SELECT * FROM b EXCEPT SELECT * FROM r))
        |ORDER BY op, c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
        |  l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (year(l_shipdate) || '-Q' || quarter(l_shipdate), l_returnflag)
        |ORDER BY Quarter NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
        |ORDER BY yr NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  array_to_string(list_transform(embedding[1:8],
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS VARCHAR)), ',') AS head8,
        |  CAST(embedding[1] AS DOUBLE) AS first_dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_null_handling" ->
      s"""WITH gdp AS (
         |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |    ${sa("o_totalprice")} AS avg_price FROM orders GROUP BY 1
         |), infl AS (
         |  SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |    ${sa("l_quantity")} AS avg_qty FROM lineitem GROUP BY 1
         |), flow AS (
         |  SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |    ${ss("l_extendedprice")} AS r_revenue
         |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
         |), shock AS (
         |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
         |    COUNT(*) AS n_urgent FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
         |)
         |SELECT Quarter,
         |  COALESCE(avg_price, 0.0) AS price_filled,
         |  avg_qty IS NULL AS qty_missing,
         |  NULLIF(n_urgent, 0) AS urgent_or_null,
         |  CASE WHEN r_revenue > 0 THEN 'has_returns' ELSE 'none' END AS returns_flag
         |FROM gdp FULL JOIN infl USING (Quarter)
         |FULL JOIN flow USING (Quarter) FULL JOIN shock USING (Quarter)
         |ORDER BY Quarter""".stripMargin,
    "q_ffill" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_type = 'click' THEN value END AS v,
        |  last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fill_down" ->
      """WITH qs AS (
        |  SELECT DISTINCT CAST(year(o_orderdate) AS VARCHAR) AS y,
        |    CAST(quarter(o_orderdate) AS VARCHAR) AS q FROM orders
        |), lab AS (
        |  SELECT CASE WHEN q = '1' THEN y ELSE 'Q' || q END AS label, y, q FROM qs
        |), ord AS (
        |  SELECT CAST(row_number() OVER (ORDER BY y, q) AS INTEGER) AS _idx, label FROM lab
        |), f AS (
        |  SELECT _idx, label,
        |    last_value(CASE WHEN length(label) = 4 THEN label END IGNORE NULLS)
        |      OVER (ORDER BY _idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS year_filled
        |  FROM ord)
        |SELECT _idx, label, year_filled,
        |  CASE WHEN length(label) <> 4 THEN year_filled || '-' || label END AS quarter_key
        |FROM f ORDER BY _idx""".stripMargin,
    "q_window_analytics" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 5 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM numbered GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), shall AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 1),
         |      i -> array_to_string(tk[i:i+2], ' '))) AS s
         |  FROM toks
         |), keep AS (
         |  SELECT s FROM shall GROUP BY s HAVING COUNT(*) <= ${Dedup.DefaultMaxShingleDf}
         |), sh AS (
         |  SELECT shall.doc_id, shall.s FROM shall JOIN keep USING (s)
         |), sz AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
         |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |WHERE jaccard >= 0.1 ORDER BY doc_a, doc_b""".stripMargin,
    "q_rolling_fingerprint" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |)
         |SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(tk, w -> ${polySql("w")})),
         |  (acc,h) -> (acc*1000003 + h) % 2147483647) AS rolling_fp
         |FROM tok ORDER BY doc_id""".stripMargin,
    "q_simhash" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS w
         |    FROM documents)
         |), h AS (
         |  SELECT doc_id, ${mixedSql("w")} AS h1, ${mixedSql("w", TextOps.AltMixMult)} AS h2 FROM tok
         |), bits AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN (CASE WHEN b < 28 THEN (h1 >> b) ELSE (h2 >> (b-28)) END) & 1 = 1
         |        THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN (SELECT unnest(range(0,56)) AS b) GROUP BY doc_id, b
         |), sig AS (
         |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
         |  FROM bits GROUP BY doc_id
         |), banded AS (
         |  SELECT doc_id, sig, j AS band, (sig >> (14*j)) & 16383 AS bits
         |  FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS j)
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         |FROM banded a JOIN banded b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_minhash_lsh" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS s
         |  FROM toks
         |), hs AS (SELECT doc_id, s, ${mixedSql("s")} AS hs FROM sh),
         |sig AS (
         |  SELECT doc_id, i, MIN(((2*i+1)*hs + 12345*i+1) % 2147483647) AS h
         |  FROM hs CROSS JOIN (SELECT unnest(range(0,16)) AS i) GROUP BY doc_id, i
         |), bands AS (
         |  SELECT doc_id, i // 4 AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY i)),
         |      (acc, x) -> (acc*1000003 + x) % 2147483647) AS bh
         |  FROM sig GROUP BY doc_id, i // 4
         |), cands AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |common AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  WHERE (x.doc_id, y.doc_id) IN (SELECT (doc_a, doc_b) FROM cands)
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
         |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // CC is associative over edge union, so the incremental label merge
    // (prior corpus labels + batch pairs) equals corpus CC over the FULL
    // minhash pair graph — the oracle recomputes that from scratch:
    // the q_minhash_lsh CTE chain plus a recursive-CTE closure.
    "q_groups_incremental" -> lshGroupsOracle,
    // The STREAMED loop's final labels answer the same full-corpus
    // question: each micro-batch folds its pairs in, and CC associativity
    // makes the fixpoint independent of how the corpus was batched — so
    // the identical recompute-from-scratch SQL is the oracle, now
    // witnessing the whole foreachBatch loop (land, probe, grow, fold).
    "q_ingest_stream" -> lshGroupsOracle,
    // Signatures are per-doc functions, so incremental batch-vs-corpus
    // dedup == the full-corpus LSH pair list restricted to pairs with
    // exactly ONE side in the batch (doc_id ≡ 4 mod 5) — the oracle states
    // that equivalence directly over the same portable-hash CTE chain.
    "q_dedup_incremental" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS s
         |  FROM toks
         |), hs AS (SELECT doc_id, s, ${mixedSql("s")} AS hs FROM sh),
         |sig AS (
         |  SELECT doc_id, i, MIN(((2*i+1)*hs + 12345*i+1) % 2147483647) AS h
         |  FROM hs CROSS JOIN (SELECT unnest(range(0,16)) AS i) GROUP BY doc_id, i
         |), bands AS (
         |  SELECT doc_id, i // 4 AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY i)),
         |      (acc, x) -> (acc*1000003 + x) % 2147483647) AS bh
         |  FROM sig GROUP BY doc_id, i // 4
         |), cands AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4)
         |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |common AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  WHERE (x.doc_id, y.doc_id) IN (SELECT (doc_a, doc_b) FROM cands)
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
         |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    // The grown-index probe answers the SAME question as the one-shot
    // incremental probe — batch-2-vs-everything-older pairs — so the
    // oracle is that restriction verbatim; what the Spark side adds is
    // that the index was grown batch-by-batch, never corpus-re-signed.
    "q_dedup_multibatch" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS s
         |  FROM toks
         |), hs AS (SELECT doc_id, s, ${mixedSql("s")} AS hs FROM sh),
         |sig AS (
         |  SELECT doc_id, i, MIN(((2*i+1)*hs + 12345*i+1) % 2147483647) AS h
         |  FROM hs CROSS JOIN (SELECT unnest(range(0,16)) AS i) GROUP BY doc_id, i
         |), bands AS (
         |  SELECT doc_id, i // 4 AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY i)),
         |      (acc, x) -> (acc*1000003 + x) % 2147483647) AS bh
         |  FROM sig GROUP BY doc_id, i // 4
         |), cands AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4)
         |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |common AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  WHERE (x.doc_id, y.doc_id) IN (SELECT (doc_a, doc_b) FROM cands)
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
         |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH wb AS (
         |  SELECT vec_id, embedding,
         |    list_transform(range(0,4), j ->
         |      list_sum(list_transform(range(0,4), r -> CASE WHEN
         |        list_sum(list_transform(range(1,65),
         |          dd -> CAST(embedding[dd] AS DOUBLE) *
         |            (CASE WHEN (${mixSql(mixSql("(j*4+r)*65537 + (dd-1) + 1", TextOps.DefaultMixMult), TextOps.DefaultMixMult)}) & 1 = 1
         |             THEN 1.0 ELSE -1.0 END)))
         |        > 0 THEN (1 << r) ELSE 0 END))) AS buckets
         |  FROM embeddings
         |), q AS (SELECT embedding AS q_emb, buckets AS q_buckets FROM wb WHERE vec_id = 0)
         |SELECT vec_id,
         |  list_sum(list_transform(list_zip(embedding, q_emb),
         |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |  / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
         |   * sqrt(list_sum(list_transform(q_emb, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS sim
         |FROM wb CROSS JOIN q
         |WHERE vec_id <> 0
         |  AND len(list_filter(range(1,5), j -> buckets[j] = q_buckets[j])) > 0
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_dedup_groups" ->
      s"""$dedupGroupsCte
         |SELECT doc_id, group_id FROM groups ORDER BY doc_id""".stripMargin,
    "q_dedup_keep_best" ->
      s"""$dedupGroupsCte,
         |scored AS (
         |  SELECT g.group_id, d.doc_id,
         |    0.5 * (CAST(len(list_distinct(string_split_regex(trim(lower(d.text)), '\\s+'))) AS DOUBLE)
         |           / len(string_split_regex(trim(lower(d.text)), '\\s+')))
         |    + 0.5 * (CAST(length(regexp_replace(trim(lower(d.text)), '[^a-z ]', '', 'g')) AS DOUBLE)
         |             / length(trim(lower(d.text)))) AS score
         |  FROM documents d JOIN groups g ON d.doc_id = g.doc_id)
         |SELECT group_id, doc_id, score FROM (
         |  SELECT group_id, doc_id, score,
         |    row_number() OVER (PARTITION BY group_id ORDER BY score DESC, doc_id ASC) AS rn
         |  FROM scored)
         |WHERE rn = 1 ORDER BY group_id""".stripMargin,
    "q_corr_stats" ->
      s"""WITH mom AS (
         |  SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${ss("l_quantity")} AS sx, ${ss("l_extendedprice")} AS sy,
         |    ${sp("l_quantity", "l_quantity")} AS sxx,
         |    ${sp("l_extendedprice", "l_extendedprice")} AS syy,
         |    ${sp("l_quantity", "l_extendedprice")} AS sxy
         |  FROM lineitem GROUP BY 1)
         |SELECT Quarter,
         |  round((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 9) AS corr_qty_price,
         |  sqrt((n*sxx - sx*sx) / (n*(n-1))) AS std_qty
         |FROM mom ORDER BY Quarter""".stripMargin,
    "q_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY 1, 2
        |), tfl AS (
        |  SELECT doc_id, term, cnt, SUM(cnt) OVER (PARTITION BY doc_id) AS len FROM tf
        |), df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    round((CAST(cnt AS DOUBLE) / len) * ln(n_docs / df), 10) AS score
        |  FROM tfl JOIN df USING (term) CROSS JOIN nd
        |), ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rk <= 5 ORDER BY doc_id, term""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, 'has_orders' AS op FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, 'no_orders' AS op FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |ORDER BY c_custkey""".stripMargin,
    "q_histogram" ->
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
        |mw AS (SELECT mn, (mx - mn) / 20.0 AS w FROM mm),
        |b AS (
        |  SELECT CAST(CASE WHEN w = 0 THEN 0.0
        |              ELSE least(floor((o_totalprice - mn) / w), 19.0) END AS INTEGER) AS bin,
        |         mn, w
        |  FROM orders CROSS JOIN mw)
        |SELECT bin, mn + bin*w AS lo, COUNT(*) AS n
        |FROM b GROUP BY bin, mn, w ORDER BY bin""".stripMargin,
    "q_zscore_outliers" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_totalprice,
         |    year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter FROM orders
         |), mom AS (
         |  SELECT Quarter, CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${ss("o_totalprice")} AS s1, ${sp("o_totalprice", "o_totalprice")} AS s2
         |  FROM o GROUP BY 1
         |), st AS (
         |  SELECT Quarter, s1/n AS mean, sqrt((s2 - s1*s1/n) / (n-1)) AS std FROM mom)
         |SELECT o_orderkey, Quarter, o_totalprice, round((o_totalprice - mean)/std, 9) AS z
         |FROM o JOIN st USING (Quarter)
         |WHERE abs(round((o_totalprice - mean)/std, 9)) > 1.7
         |ORDER BY o_orderkey""".stripMargin,
    "q_sample_hash" -> {
      val k0 = "((l_orderkey*31 + l_linenumber) % 2147483647)"
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM (
         |  SELECT l_orderkey, l_linenumber, l_quantity,
         |    ${mixSql(mixSql(k0, TextOps.DefaultMixMult), TextOps.DefaultMixMult)} AS h
         |  FROM lineitem)
         |WHERE h % 100 < 5 ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_range_join" ->
      """WITH qdim AS (
        |  SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qstart FROM orders
        |), q2 AS (SELECT qstart, CAST(qstart + INTERVAL 3 MONTH AS DATE) AS qend FROM qdim)
        |SELECT qstart, COUNT(*) AS n_items
        |FROM lineitem JOIN q2 ON l_shipdate >= qstart AND l_shipdate < qend
        |GROUP BY qstart ORDER BY qstart""".stripMargin,
    "q_collect_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scan_jsonl" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_up,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  translate(p_type, ' ', '_') AS type_snake,
        |  CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS lev,
        |  substring(p_name, 1, 10) AS frag
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_window_ranks" ->
      """SELECT Quarter, o_orderkey, o_totalprice, rk, pct_rk, quartile FROM (
        |  SELECT year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
        |    o_orderkey, o_totalprice,
        |    CAST(rank() OVER w AS INTEGER) AS rk,
        |    percent_rank() OVER w AS pct_rk,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY year(o_orderdate) || '-Q' || quarter(o_orderdate)
        |               ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rk <= 5 ORDER BY Quarter, rk""".stripMargin,
    "q_month_spine" ->
      s"""WITH mm AS (
         |  SELECT CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS mn,
         |    CAST(max(date_trunc('month', o_orderdate)) AS DATE) AS mx FROM orders
         |), spine AS (
         |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS month FROM mm
         |), sparse AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |    ${sa("o_totalprice")} AS avg_big_urgent
         |  FROM orders
         |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 495000.0 GROUP BY 1)
         |SELECT month, avg_big_urgent,
         |  last_value(avg_big_urgent IGNORE NULLS)
         |    OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |FROM spine LEFT JOIN sparse USING (month) ORDER BY month""".stripMargin,
    "q_ivf_topk" -> ivfFixedOracleSql(k = 8, iters = 1, nprobe = 3,
      queryId = 0L, limit = 10),
    // Fixed-point Lloyd, unrolled (shared CTE chain kmeansOracleCtes):
    // the final assignment aF carries (vec_id, cluster, dist).
    "q_kmeans_lloyd" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2)}
         |SELECT vec_id, cluster, dist FROM aF ORDER BY vec_id""".stripMargin,
    // Refined-IVF probe + exact cosine re-rank on top of the same chain:
    // probe = nprobe lowest fixed-point squared-L2 centroid distances from
    // the query's quantized vector (ties to lowest cluster) — mirrors
    // Similarity.ivfTopkFixed exactly, including the re-rank's cosSql.
    // Streaming mini-batch k-means: bootstrap stats s0 from the corpus
    // Lloyd assignment, then per arriving fifth: derive centroids
    // (ssum // n), assign, fold the batch's (ssum, n) in. All BIGINT;
    // the final centroids replay the loop's committed state exactly.
    "q_stream_kmeans" -> {
      val updates = Seq((1, "= 3"), (2, "= 4")).map { case (i, filt) =>
        s"""k${i}c AS (
           |  SELECT cluster, pos, CAST(ssum // n AS BIGINT) AS c FROM s${i - 1}),
           |k${i}p AS (
           |  SELECT vec_id, CAST(i AS INTEGER) AS pos,
           |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
           |      + 1000000 AS e
           |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 $filt)
           |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
           |k${i}d AS (
           |  SELECT p.vec_id, c.cluster,
           |    CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS dist
           |  FROM k${i}p p JOIN k${i}c c ON p.pos = c.pos GROUP BY 1, 2),
           |k${i}a AS (
           |  SELECT vec_id, cluster FROM (
           |    SELECT vec_id, cluster,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
           |    FROM k${i}d) WHERE rn = 1),
           |k${i}s AS (
           |  SELECT a.cluster, p.pos, CAST(SUM(p.e) AS BIGINT) AS ssum,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM k${i}p p JOIN k${i}a a ON p.vec_id = a.vec_id GROUP BY 1, 2),
           |s$i AS (
           |  SELECT s.cluster, s.pos,
           |    CAST(s.ssum + COALESCE(b.ssum, 0) AS BIGINT) AS ssum,
           |    CAST(s.n + COALESCE(b.n, 0) AS BIGINT) AS n
           |  FROM s${i - 1} s LEFT JOIN k${i}s b
           |    ON s.cluster = b.cluster AND s.pos = b.pos)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2,
             src = "SELECT * FROM embeddings WHERE vec_id % 5 < 3")},
         |s0 AS (
         |  SELECT a.cluster, p.pos, CAST(SUM(p.e) AS BIGINT) AS ssum,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM pts p JOIN aF a ON p.vec_id = a.vec_id GROUP BY 1, 2),
         |$updates
         |SELECT cluster, pos, CAST(ssum // n AS BIGINT) AS c, n
         |FROM s2 ORDER BY cluster, pos""".stripMargin
    },
    // Streaming IVF loop: index built from the corpus 3/5, both remaining
    // fifths streamed in and assigned — the oracle replays the Lloyd chain
    // over the corpus and assigns the arrived vectors in one batch pass.
    "q_stream_ivf" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2,
             src = "SELECT * FROM embeddings WHERE vec_id % 5 < 3")},
         |bpts AS (
         |  SELECT vec_id, CAST(i AS INTEGER) AS pos,
         |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
         |      + 1000000 AS e
         |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 >= 3)
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
         |bd AS (
         |  SELECT p.vec_id, c.cluster,
         |    CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS dist
         |  FROM bpts p JOIN c2 c ON p.pos = c.pos GROUP BY 1, 2)
         |SELECT vec_id, cluster, dist FROM (
         |  SELECT vec_id, cluster, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |  FROM bd) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    // Incremental IVF: the Lloyd chain runs over the CORPUS 4/5 only (the
    // stored index's content), and the held-out batch fifth assigns against
    // c2 with the same argmin/tie rule — replaying exactly what
    // Similarity.assignToCentroidIndex computes from the persisted table.
    "q_ivf_incremental" ->
      s"""WITH ${kmeansOracleCtes(k = 8, iters = 2,
             src = "SELECT * FROM embeddings WHERE vec_id % 5 < 4")},
         |bpts AS (
         |  SELECT vec_id, CAST(i AS INTEGER) AS pos,
         |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
         |      + 1000000 AS e
         |  FROM (SELECT * FROM embeddings WHERE vec_id % 5 = 4)
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
         |bd AS (
         |  SELECT p.vec_id, c.cluster,
         |    CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS dist
         |  FROM bpts p JOIN c2 c ON p.pos = c.pos GROUP BY 1, 2)
         |SELECT vec_id, cluster, dist FROM (
         |  SELECT vec_id, cluster, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |  FROM bd) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    "q_ivf_refined" -> ivfFixedOracleSql(k = 8, iters = 2, nprobe = 2,
      queryId = 0L, limit = 10),
    // cid = RANK of the centroid (not its vec_id): Spark's cluster column is
    // the centroid ARRAY INDEX, and the rank form stays aligned even if
    // vec_ids ever stop being contiguous. Drop rule = the SemDeDup paper's
    // upper-triangle formulation; priority (csim ASC, vec_id ASC) mirrors
    // Similarity.semDedup exactly.
    "q_semdedup" ->
      s"""WITH cent AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cemb
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         |sims AS (
         |  SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.cemb")} AS s
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, embedding, cid, s AS csim FROM (
         |    SELECT vec_id, embedding, cid, s,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         |    FROM sims) WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id <> b.vec_id
         |  WHERE (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
         |    AND ${cosSql("a.embedding", "b.embedding")} > 0.4)
         |SELECT a.vec_id, a.cid AS cluster, a.csim, (d.vec_id IS NULL) AS kept
         |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,
    // Recomputes Media.fakeDecode from the planted ASCII payloads: byte
    // histogram via per-char codepoint bins (char == byte — the canary
    // below asserts pure ASCII), f32 normalization (float4 division is
    // correctly-rounded IEEE in both engines, counts < 2^24 exact in f32),
    // then the same floor(×1e6) serialization as serializeFloats. The
    // `c <> ''` guard drops the single empty-string element string_split
    // yields for an empty payload, matching the zero-histogram branch.
    "q_media_features" ->
      """WITH chars AS (
        |  SELECT doc_id, ord(c) // 32 AS bin
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
        |  WHERE c <> ''),
        |cnts AS (SELECT doc_id, bin, count(*) AS cnt FROM chars GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, greatest(length(d.text), 1) AS n, length(d.text) AS len, i.bin
        |  FROM documents d CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) i),
        |feat AS (
        |  SELECT g.doc_id, g.len, g.bin,
        |    CAST(floor(CAST(CAST(COALESCE(c.cnt, 0) AS FLOAT) / CAST(g.n AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM grid g LEFT JOIN cnts c ON g.doc_id = c.doc_id AND g.bin = c.bin)
        |SELECT doc_id, 'image' AS modality,
        |  CAST(16 + (len % 64) AS INTEGER) AS width,
        |  CAST(16 + ((len // 64) % 64) AS INTEGER) AS height,
        |  string_agg(CAST(q AS VARCHAR), ',' ORDER BY bin) AS features
        |FROM feat GROUP BY doc_id, len ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |    CAST(unnest(range(0, CAST(floor((greatest(length(text), 1) - 1) / 256) AS BIGINT) + 1)) AS INTEGER) AS frame_idx
         |  FROM documents)
         |SELECT doc_id, frame_idx,
         |  ${mixSql(mixSql(s"(${polySql("substring(text, frame_idx * 256 + 1, 64)")})", TextOps.DefaultMixMult), TextOps.DefaultMixMult)} AS frame_fp,
         |  CAST(least(64, length(text) - frame_idx * 256) AS INTEGER) AS frame_chars
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_skew_salted" ->
      s"""SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |  ${ss("l_quantity")} AS sum_value,
         |  COUNT(l_quantity) AS n,
         |  ${ss("l_quantity")} / COUNT(l_quantity) AS avg_value
         |FROM lineitem GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_join_bucketed" ->
      s"""SELECT o_orderpriority, ${ss("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_quarterly" ->
      s"""SELECT year(ts) || '-Q' || quarter(ts) AS Quarter,
         |  COUNT(*) AS n, ${ss("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_regex_extract" ->
      """SELECT CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
        |  COUNT(*) AS n
        |FROM part GROUP BY 1 ORDER BY brand_num""".stripMargin,
    "q_minmax_by" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    year(o_orderdate) || '-Q' || quarter(o_orderdate) AS Quarter,
        |    lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 12, '0')
        |      || '#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS k
        |  FROM orders)
        |SELECT Quarter,
        |  arg_max(o_orderkey, k) AS top_order,
        |  arg_min(o_orderkey, k) AS bottom_order,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
        |FROM o GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_map_pivot" ->
      s"""SELECT year(l_shipdate) || '-Q' || quarter(l_shipdate) AS Quarter,
         |  ${ss("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
         |  ${ss("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
         |  ${ss("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
         |FROM lineitem GROUP BY 1 ORDER BY Quarter""".stripMargin,
    "q_topk_cosine" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  list_sum(list_transform(list_zip(embedding, (SELECT qe FROM q)),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform((SELECT qe FROM q), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_dedup_embed" ->
      s"""WITH $embedBandedCtes
         |SELECT vec_a, vec_b, sim FROM epairs ORDER BY vec_a, vec_b""".stripMargin,
    "q_dedup_embed_groups" ->
      s"""WITH RECURSIVE $embedBandedCtes,
         |edges AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM epairs
         |  UNION ALL SELECT vec_b, vec_a FROM epairs
         |), reach AS (
         |  SELECT vec_id, vec_id AS r FROM embeddings
         |  UNION
         |  SELECT e.src AS vec_id, reach.r FROM edges e JOIN reach ON e.dst = reach.vec_id
         |)
         |SELECT vec_id, MIN(r) AS group_id FROM reach GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin,
    "q_embed_norms" ->
      """WITH norms AS (
        |  SELECT vec_id, label,
        |    sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,20)) ) AS DOUBLE)) AS norm
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id, label)
        |SELECT label,
        |  CAST(SUM(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(norm) AS avg_norm,
        |  COUNT(*) AS n
        |FROM norms GROUP BY label ORDER BY label""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_obs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents)
        |SELECT doc_id, lang, stop_ratio,
        |  CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(COUNT(CASE WHEN w IN ('a','an','the','of','to','in','and','is','it','for','on','with') THEN 1 END) AS DOUBLE)
        |      / COUNT(*) AS stop_ratio
        |  FROM tok GROUP BY 1, 2)
        |ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id, ttr, alpha_ratio, 0.5 * ttr + 0.5 * alpha_ratio AS score
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(trim(lower(text)), '\s+')) AS ttr,
        |    CAST(length(regexp_replace(trim(lower(text)), '[^a-z ]', '', 'g')) AS DOUBLE)
        |      / length(trim(lower(text))) AS alpha_ratio
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_repetition_ratio" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
        |), s3 AS (
        |  SELECT doc_id, tk,
        |    list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) AS sh
        |  FROM t)
        |SELECT doc_id, dup_word_frac, dup_3gram_frac,
        |  dup_word_frac > 0.3 OR dup_3gram_frac > 0.2 AS flagged
        |FROM (
        |  SELECT doc_id,
        |    1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS dup_word_frac,
        |    CASE WHEN len(tk) >= 3
        |      THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
        |      ELSE 0.0 END AS dup_3gram_frac
        |  FROM s3)
        |ORDER BY doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH g AS (
        |  SELECT source, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens,
        |    CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(28,9)) AS w
        |  FROM documents GROUP BY 1, 2
        |), tot AS (SELECT SUM(w) AS w_total FROM g)
        |SELECT source, lang, n_docs, n_tokens,
        |  CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE) AS weight
        |FROM g CROSS JOIN tot ORDER BY source, lang""".stripMargin,
    "q_vocab_topk" ->
      """WITH terms AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents
        |), freqs AS (
        |  SELECT term, COUNT(*) AS freq FROM terms GROUP BY 1)
        |SELECT CAST(token_id AS INTEGER) AS token_id, term, freq FROM (
        |  SELECT term, freq,
        |    row_number() OVER (ORDER BY freq DESC, term ASC) - 1 AS token_id
        |  FROM freqs)
        |WHERE token_id < 256 ORDER BY token_id""".stripMargin,
    "q_vocab_coverage" ->
      """WITH terms AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents
        |), freqs AS (
        |  SELECT term, COUNT(*) AS freq FROM terms GROUP BY 1),
        |ranked AS (
        |  SELECT term, freq,
        |    row_number() OVER (ORDER BY freq DESC, term ASC) AS rank,
        |    SUM(freq) OVER (ORDER BY freq DESC, term ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_freq
        |  FROM freqs),
        |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS t FROM freqs)
        |SELECT CAST(rank AS INTEGER) AS rank, term, CAST(freq AS BIGINT) AS freq,
        |  CAST(cum_freq AS BIGINT) AS cum_freq, CAST(cum_freq AS DOUBLE) / t AS coverage
        |FROM ranked, tot WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // ln rounds to 6dp BEFORE the decimal moment sums (libm parity); the
    // slope expression repeats unrounded inside intercept on BOTH sides so
    // rounding points line up exactly
    "q_token_zipf" -> {
      val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
      s"""WITH terms AS (
         |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents
         |), freqs AS (
         |  SELECT term, COUNT(*) AS freq FROM terms GROUP BY 1),
         |ranked AS (
         |  SELECT term, freq,
         |    row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
         |  FROM freqs),
         |pts AS (
         |  SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
         |    round(ln(CAST(freq AS DOUBLE)), 6) AS y
         |  FROM ranked WHERE rank <= 100),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    ${ss("x")} AS sx, ${ss("y")} AS sy,
         |    ${sp("x", "y")} AS sxy, ${sp("x", "x")} AS sxx
         |  FROM pts)
         |SELECT n AS n_terms, round($slope, 6) AS slope,
         |  round((sy - ($slope) * sx) / n, 6) AS intercept
         |FROM m""".stripMargin
    },
    "q_curation_pipeline" -> {
      val k0 = s"(doc_id % ${TextOps.HashMod})"
      val h = mixSql(mixSql(k0, TextOps.DefaultMixMult), TextOps.DefaultMixMult)
      s"""WITH q AS (
         |  SELECT doc_id, source, trim(lower(text)) AS norm,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents
         |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 30),
         |d AS (
         |  SELECT doc_id, source, n_tok FROM (
         |    SELECT doc_id, source, n_tok,
         |      row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
         |    FROM q) WHERE rn = 1),
         |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM d GROUP BY 1),
         |kept AS (
         |  SELECT d.doc_id, d.source, d.n_tok, $h AS hh
         |  FROM d JOIN c ON d.source = c.source
         |  WHERE $h % c.n_src < LEAST(c.n_src, 10))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY source ORDER BY source""".stripMargin
    },
    "q_source_cap_sample" -> {
      val k0 = s"(doc_id % ${TextOps.HashMod})"
      s"""WITH counts AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM documents GROUP BY 1)
         |SELECT doc_id, source, n_src FROM (
         |  SELECT d.doc_id, d.source, c.n_src,
         |    ${mixSql(mixSql(k0, TextOps.DefaultMixMult), TextOps.DefaultMixMult)} AS h
         |  FROM documents d JOIN counts c ON d.source = c.source)
         |WHERE h % n_src < LEAST(n_src, 10) ORDER BY doc_id""".stripMargin
    },
    "q_doc_fingerprint" ->
      "SELECT doc_id, md5(lang || '|' || trim(lower(text))) AS fp FROM documents ORDER BY doc_id",
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      s"""WITH e AS (
         |  SELECT doc_id,
         |    text || ' user' || CAST(doc_id AS VARCHAR) || '@' || source ||
         |      '.org tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |      ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS enriched
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(enriched,
         |    '${TextOps.PiiEmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.PiiPhonePattern}', '<PHONE>', 'g'),
         |    '${TextOps.PiiIpPattern}', '<IP>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(enriched, '${TextOps.PiiEmailPattern}')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(enriched, '${TextOps.PiiPhonePattern}')) AS INTEGER) AS n_phones,
         |  CAST(len(regexp_extract_all(enriched, '${TextOps.PiiIpPattern}')) AS INTEGER) AS n_ips
         |FROM e ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> array_to_string(tk[i:i+7], ' ')))) AS s
        |  FROM tok
        |), ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 8)
        |SELECT sh.doc_id, COUNT(*) AS n_hits
        |FROM sh JOIN ev USING (s)
        |WHERE sh.doc_id % 10 <> 8
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_global_ids" ->
      """SELECT o_orderkey, o_orderpriority,
        |  row_number() OVER (ORDER BY o_orderkey) AS gid
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE (${mixedSql("CAST(doc_id AS VARCHAR)")}) % 100
         |  < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,
    "q_scan_orc" ->
      s"""SELECT event_type, COUNT(*) AS n, ${ss("value")} AS sum_value
         |FROM events WHERE event_type <> 'error'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged
        |), sess AS (
        |  SELECT user_id, epoch_ms(MIN(ts)) AS session_start_ms,
        |    epoch_ms(MAX(ts)) AS session_end_ms,
        |    CAST(COUNT(*) AS INTEGER) AS n_events
        |  FROM numbered GROUP BY user_id, sess_id
        |), cut AS (SELECT epoch_ms(MAX(ts)) AS max_ms FROM events)
        |SELECT user_id, session_start_ms, n_events,
        |  (session_end_ms - session_start_ms) // 1000 AS duration_secs
        |FROM sess, cut
        |WHERE session_end_ms + 5*60*1000 <= max_ms - 30*60*1000
        |ORDER BY user_id, session_start_ms""".stripMargin,
    "q_text_normalize" ->
      """WITH r AS (
        |  SELECT doc_id, replace(text, 'a', 'a' || chr(769)) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        |  CAST(length(raw) AS INTEGER) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS INTEGER) AS len_nfc
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_line_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(w[i*8+1 : i*8+8], ' ') AS chunk
        |  FROM tk, LATERAL (SELECT unnest(range(0,
        |    CAST(ceil(len(w) / 8.0) AS BIGINT))) AS i)),
        |keep AS (
        |  SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |  FROM ch)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(chunk ORDER BY pos)
        |    FILTER (WHERE rn = 1), ' '), '') AS new_text,
        |  count(*) FILTER (WHERE rn = 1) AS n_kept,
        |  count(*) FILTER (WHERE rn <> 1) AS n_dropped
        |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // 4-token grams (slice tk[i:i+3] is INCLUSIVE in DuckDB), df-capped at
    // Dedup.DefaultMaxShingleDf like the jaccard oracles; islands merge via
    // pos - row_number() per (doc_a, doc_b, diagonal) — mirrors
    // Dedup.dupSpans step for step.
    "q_dup_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |  FROM documents),
         |gidx AS (
         |  SELECT doc_id, tk,
         |    CAST(unnest(range(1, greatest(len(tk) - 2, 1))) AS INTEGER) AS i
         |  FROM toks),
         |grams AS (
         |  SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+3], ' ') AS g
         |  FROM gidx),
         |keep AS (
         |  SELECT g FROM grams GROUP BY g
         |  HAVING COUNT(DISTINCT doc_id) <= ${Dedup.DefaultMaxShingleDf}),
         |gr AS (SELECT grams.doc_id, grams.pos, grams.g
         |       FROM grams JOIN keep USING (g)),
         |m AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
         |  FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id),
         |isl AS (
         |  SELECT *, pa - row_number()
         |    OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
         |  FROM m)
         |SELECT doc_a, doc_b,
         |  CAST(min(pa) AS INTEGER) AS a_start, CAST(min(pb) AS INTEGER) AS b_start,
         |  COUNT(*) + 3 AS span_tokens
         |FROM isl GROUP BY doc_a, doc_b, diag, grp
         |HAVING COUNT(*) + 3 >= 8
         |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, n_tok, cum_before,
        |  cum_before // 512 AS pack_id, cum_before % 512 AS pack_off
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_embed_quantize" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
        |  FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e,
        |    list_max(list_transform(e, v -> abs(v))) / 127.0 AS scale
        |  FROM x),
        |q AS (
        |  SELECT vec_id, e, scale,
        |    list_transform(e, v -> CAST(CASE WHEN scale = 0 THEN 0
        |      ELSE floor(v / scale + 0.5) END AS INTEGER)) AS qs
        |  FROM sc)
        |SELECT vec_id, round(scale, 9) AS scale,
        |  array_to_string(qs, ',') AS q_str,
        |  round(list_max(list_transform(list_zip(qs, e),
        |    p -> abs(CAST(p[1] AS DOUBLE) * scale - p[2]))), 9) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_skew_join_salted" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS INTEGER) AS type_weight
        |  FROM events)
        |SELECT event_id, event_type, type_weight, value
        |FROM events JOIN dim USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
        |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total FROM tf)
        |SELECT doc_id, COUNT(*) AS n_tok,
        |  round(AVG(-ln(CAST(tf AS DOUBLE) / n_total)), 6) AS surprisal
        |FROM toks JOIN tf USING (term), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_sink_upsert" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
         |  COUNT(*) AS n,
         |  ${ss("CASE WHEN strftime(ts, '%Y-%m-%d') = '2024-01-15' THEN value * 2 ELSE value END")} AS sum_value
         |FROM events
         |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  round((ln(CAST(SUM(c) AS DOUBLE))
        |         - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
        |           / CAST(SUM(c) AS DOUBLE)) / ln(2.0), 6) AS entropy
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ewma_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), pre AS (
        |  SELECT event_type, day, n,
        |    array_agg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hist
        |  FROM daily)
        |SELECT event_type, day, n,
        |  round(list_reduce(hist, (acc, x) -> acc * 0.75 + x * 0.25), 9) AS ewma
        |FROM pre ORDER BY event_type, day""".stripMargin,
    "q_ann_batch" ->
      s"""WITH $embedBucketCtes, acands AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
         |  FROM bd q JOIN bd c
         |    ON q.band = c.band AND q.bkt = c.bkt AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id % 50 = 0
         |), scored AS (
         |  SELECT query_id, acands.vec_id,
         |    ${cosSql("qa.embedding", "ca.embedding")} AS sim
         |  FROM acands JOIN embeddings qa ON acands.query_id = qa.vec_id
         |              JOIN embeddings ca ON acands.vec_id = ca.vec_id
         |), ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS INTEGER) AS rk
         |  FROM scored)
         |SELECT query_id, vec_id, sim, rk FROM ranked
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "q_stream_enrich" ->
      s"""SELECT n.n_name, e.event_type, COUNT(*) AS n,
         |  ${ss("e.value")} AS sum_value
         |FROM events e
         |JOIN customer c ON e.user_id = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY 1, 2 ORDER BY n_name, event_type""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${ss("l_quantity")} AS sum_qty, COUNT(*) AS n,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_scd2" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  event_id, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current,
        |  value AS plan_value
        |FROM events WHERE event_type = 'signup'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q_cdc_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |), chg AS (
        |  SELECT o_orderkey, 1 AS seq, 'U' AS op,
        |    o_totalprice + 10.0 AS p, 'P' AS st FROM base WHERE o_orderkey % 100 = 3
        |  UNION ALL SELECT o_orderkey, 2, 'U',
        |    o_totalprice + 20.0, 'F' FROM base WHERE o_orderkey % 1000 = 3
        |  UNION ALL SELECT o_orderkey, 1, 'D',
        |    NULL, NULL FROM base WHERE o_orderkey % 100 = 7
        |  UNION ALL SELECT o_orderkey + 100000000, 1, 'I',
        |    1.0, 'O' FROM base WHERE o_orderkey % 100 = 11
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT chg.*, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM chg)
        |  WHERE rn = 1)
        |SELECT o_orderkey,
        |  COALESCE(l.p, b.o_totalprice) AS o_totalprice,
        |  COALESCE(l.st, b.o_orderstatus) AS o_orderstatus
        |FROM base b FULL OUTER JOIN latest l USING (o_orderkey)
        |WHERE COALESCE(l.op, '') <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "q_bloom_join" ->
      s"""SELECT l_returnflag, ${ss("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_orderkey IN (
         |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_embed_gram" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(i AS INTEGER) AS i,
        |    CAST(embedding[i + 1] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
        |), g AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS BIGINT) AS g12
        |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2)
        |SELECT i, j, g12, CAST(g12 AS DOUBLE) / 1e12 AS g
        |FROM g ORDER BY i, j""".stripMargin,
    "q_sliding_window" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n, sum_value,
        |  CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
        |  CAST(SUM(CAST(sum_value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_value_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,
    "q_window_distribution" ->
      """SELECT event_id, event_type, value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdf
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_zorder_key" -> {
      val zk = graft.functions.ZOrder.zOrderKeySql(
        "(o_custkey % 65536)",
        "(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 65536)")
      s"""SELECT o_orderkey, $zk AS zkey
         |FROM orders ORDER BY zkey, o_orderkey""".stripMargin
    },
    "q_stream_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
        |  p.ts AS p_ts, v.ts AS v_ts
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND v.event_type <> 'purchase'
        |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin,
    "q_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bgs AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
        |  FROM toks),
        |bgc AS (SELECT bg, COUNT(*) AS c FROM bgs GROUP BY bg),
        |pc AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(c) AS BIGINT) AS c1
        |       FROM bgc GROUP BY 1),
        |model AS (
        |  SELECT bg, c, c1 FROM bgc JOIN pc ON split_part(bg, ' ', 1) = pc.w1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  round(AVG(-ln(CAST(c AS DOUBLE) / c1)), 6) AS surprisal
        |FROM bgs JOIN model USING (bg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM tf)
        |SELECT term, c, round(CAST(c AS DOUBLE) / n_total, 6) AS freq
        |FROM tf, tot
        |WHERE c >= n_total * 0.002
        |ORDER BY c DESC, term""".stripMargin,
    "q_fuzzy_match" ->
      """WITH cust AS (SELECT c_custkey AS k, c_name AS name FROM customer),
        |dirty AS (
        |  SELECT k + 1000000 AS k, substring(name, 1, 17) || 'X' AS name
        |  FROM cust WHERE k % 40 = 1
        |  UNION ALL
        |  SELECT k + 2000000, substring(name, 1, length(name) - 1)
        |  FROM cust WHERE k % 40 = 2)
        |SELECT a.k AS base_key, b.k AS dirty_key,
        |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
        |FROM cust a JOIN dirty b
        |  ON substring(a.name, 1, 16) = substring(b.name, 1, 16)
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY base_key, dirty_key""".stripMargin,
    "q_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN len(tk) <= 16 THEN 1
        |         ELSE CAST(ceil((len(tk) - 16) / 12.0) AS INTEGER) + 1 END AS n_chunks
        |  FROM toks),
        |e AS (
        |  SELECT doc_id, tk, unnest(range(0, n_chunks)) AS i FROM c)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
        |  CAST(i * 12 AS INTEGER) AS tok_start,
        |  array_to_string(tk[i*12+1 : i*12+16], ' ') AS chunk
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |vocab AS (
        |  SELECT term FROM (
        |    SELECT term, row_number() OVER (ORDER BY c DESC, term) AS rk FROM tf)
        |  WHERE rk <= 20),
        |per_doc AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
        |oov AS (
        |  SELECT doc_id, COUNT(*) AS n_oov FROM toks
        |  WHERE term NOT IN (SELECT term FROM vocab)
        |  GROUP BY doc_id)
        |SELECT p.doc_id, p.n_tok,
        |  COALESCE(o.n_oov, 0) AS n_oov,
        |  round(CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / p.n_tok, 6) AS oov_rate
        |FROM per_doc p LEFT JOIN oov o ON p.doc_id = o.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    "q_winsorize" ->
      """WITH q AS (
        |  SELECT percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS lo,
        |         percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS hi
        |  FROM orders)
        |SELECT o_orderkey, o_totalprice,
        |  least(greatest(o_totalprice, lo), hi) AS clipped,
        |  (o_totalprice < lo OR o_totalprice > hi) AS was_outlier
        |FROM orders, q ORDER BY o_orderkey""".stripMargin,
    "q_interpolate" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v0
        |  FROM events GROUP BY 1, 2),
        |holes AS (
        |  SELECT event_type, day,
        |    CASE WHEN dayofmonth(day) % 7 = 3 THEN NULL ELSE v0 END AS v
        |  FROM daily),
        |ctx AS (
        |  SELECT event_type, day, v,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wb AS pd,
        |    first_value(v IGNORE NULLS) OVER wa AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wa AS nd
        |  FROM holes
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wa AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, day, v,
        |  round(COALESCE(v,
        |    pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
        |                      / date_diff('day', pd, nd)),
        |    pv, nv), 6) AS filled
        |FROM ctx ORDER BY event_type, day""".stripMargin,
    "q_sink_jsonl" ->
      s"""SELECT event_type, COUNT(*) AS n, ${ss("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sql_top_orders" ->
      s"""SELECT o.o_orderkey,
         |  ${sp("l.l_extendedprice", "1 - l.l_discount")} AS revenue,
         |  o.o_orderdate
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |GROUP BY o.o_orderkey, o.o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY 1)
        |SELECT cohort,
        |  CAST(date_diff('day', cohort, day) AS INTEGER) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS active_users
        |FROM ev e JOIN first f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT COUNT(t1) AS n_viewed, COUNT(t2) AS n_clicked,
        |  COUNT(t3) AS n_purchased
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q_bigram_pmi" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |e AS (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks),
        |bgs AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM e),
        |bgc AS (SELECT w1, w2, COUNT(*) AS c FROM bgs GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM bgc),
        |pre AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM bgc GROUP BY 1),
        |suf AS (SELECT w2, CAST(SUM(c) AS BIGINT) AS c2 FROM bgc GROUP BY 1)
        |SELECT b.w1, b.w2, b.c,
        |  round(ln(CAST(b.c AS DOUBLE) * n_total / (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi
        |FROM bgc b JOIN pre USING (w1) JOIN suf USING (w2), tot
        |WHERE b.c >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    "q_lang_length_filter" ->
      """WITH th AS (
        |  SELECT lang,
        |    percentile_cont(0.10) WITHIN GROUP (ORDER BY n_chars) AS p10
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars
        |FROM documents d JOIN th ON d.lang = th.lang
        |WHERE n_chars >= p10
        |ORDER BY doc_id""".stripMargin,
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // boundary doubles come from the same interpolated exact percentile in
    // both engines (the q_quantiles precedent), so bucket comparisons agree
    "q_equidepth" ->
      """WITH b AS (
        |  SELECT quantile_cont(o_totalprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n_rows, MIN(v) AS min_v, MAX(v) AS max_v
        |FROM (
        |  SELECT o_totalprice AS v,
        |    CAST(list_sum(list_transform(b.bs,
        |      x -> CASE WHEN o_totalprice > x THEN 1 ELSE 0 END)) AS INTEGER) AS bucket
        |  FROM orders, b)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_containment" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), shall AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 1),
         |      i -> array_to_string(tk[i:i+2], ' '))) AS s
         |  FROM toks
         |), keep AS (
         |  SELECT s FROM shall GROUP BY s HAVING COUNT(*) <= ${Dedup.DefaultMaxShingleDf}
         |), sh AS (
         |  SELECT shall.doc_id, shall.s FROM shall JOIN keep USING (s)
         |), sz AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
         |), common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, containment FROM (
         |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / least(x.n, y.n) AS containment
         |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |WHERE containment >= 0.9 ORDER BY doc_a, doc_b""".stripMargin,
    "q_weighted_median" ->
      """WITH wv AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    SUM(CAST(FLOOR(l_quantity * 1000000) AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw
        |  FROM wv),
        |g AS (SELECT l_returnflag, SUM(w) AS tw FROM wv GROUP BY 1)
        |SELECT c.l_returnflag, MIN(v) AS weighted_median
        |FROM c JOIN g USING (l_returnflag)
        |WHERE 2 * cw >= tw
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the old batch's rows surface NULL priority through the merged scan;
    // explicit NULLS FIRST pins both engines to the same null placement
    "q_scan_evolved" ->
      """SELECT
        |  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |       THEN NULL ELSE o_orderpriority END AS o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
    "q_triangles" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT x.a AS p1, x.b AS p2, y.b AS p3
        |FROM e x JOIN e y ON x.b = y.a
        |         JOIN e z ON z.a = x.a AND z.b = y.b
        |ORDER BY p1, p2, p3""".stripMargin,
    "q_budget_alloc" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT SUM(w) AS tw FROM g),
        |b AS (
        |  SELECT lang, source, w,
        |    (1000000 * w) // tw AS base, (1000000 * w) % tw AS rem
        |  FROM g, t),
        |l AS (SELECT 1000000 - SUM(base) AS leftover FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rk FROM b)
        |SELECT lang, source, w,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, l ORDER BY lang, source""".stripMargin,
    // same quantization spelling as q_embed_quantize; the dot is BIGINT
    // arithmetic end-to-end, so ranking ties are broken by vec_id alone
    "q_ann_int8" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
        |  FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e,
        |    list_max(list_transform(e, v -> abs(v))) / 127.0 AS scale
        |  FROM x),
        |qv AS (
        |  SELECT vec_id,
        |    list_transform(e, v -> CAST(CASE WHEN scale = 0 THEN 0
        |      ELSE floor(v / scale + 0.5) END AS BIGINT)) AS q
        |  FROM sc),
        |query AS (SELECT q AS qq FROM qv WHERE vec_id = 0)
        |SELECT v.vec_id,
        |  CAST(list_sum(list_transform(list_zip(v.q, query.qq),
        |    p -> p[1] * p[2])) AS BIGINT) AS dot_q
        |FROM qv v, query WHERE v.vec_id <> 0
        |ORDER BY dot_q DESC, vec_id LIMIT 10""".stripMargin,
    // 1-based DuckDB positions vs Spark's 0-based: positions only order
    // the prefix-sum window and the rebuild, so the offset is immaterial
    "q_cdc_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents
         |), t AS (
         |  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos, tk FROM toks
         |), f AS (
         |  SELECT doc_id, pos, tk[pos] AS tok,
         |    CASE WHEN (${mixedSql("tk[pos]")}) % 8 = 0 THEN 1 ELSE 0 END AS flag
         |  FROM t
         |), c AS (
         |  SELECT doc_id, pos, tok,
         |    COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
         |  FROM f)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
         |  COUNT(*) AS n_tokens
         |FROM c GROUP BY doc_id, chunk_id
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_copurchase" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, support FROM pairs
        |ORDER BY support DESC, part_a, part_b LIMIT 50""".stripMargin,
    "q_sql_region_revenue" ->
      s"""SELECT n.n_name,
         |  ${Scalar.stableSumProdSql("l.l_extendedprice", "1 - l.l_discount")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |             AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_profile" -> {
      val num = Seq("o_orderkey", "o_custkey", "o_totalprice")
      val str = Seq("o_orderstatus", "o_orderpriority")
      val cells =
        num.flatMap(c => Seq(
          s"SELECT '$c' AS col_name, 'n_null' AS metric, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM orders",
          s"SELECT '$c', 'n_distinct', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM orders",
          s"SELECT '$c', 'min', CAST(MIN($c) AS DOUBLE) FROM orders",
          s"SELECT '$c', 'max', CAST(MAX($c) AS DOUBLE) FROM orders")) ++
        str.flatMap(c => Seq(
          s"SELECT '$c', 'n_null', CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM orders",
          s"SELECT '$c', 'n_distinct', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM orders"))
      cells.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, metric")
    },
    "q_mad_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type,
        |    percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt) AS med
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.event_type, d.day, d.cnt, m.med, abs(d.cnt - m.med) AS adev
        |  FROM daily d JOIN med m ON d.event_type = m.event_type),
        |mad AS (
        |  SELECT event_type,
        |    percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, d.day, d.cnt, d.med, a.mad,
        |  CAST(d.adev > 3.0 * a.mad AS INTEGER) AS is_outlier
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |ORDER BY d.event_type, d.day""".stripMargin,
    // prefix bound in INTEGER arithmetic ((2n+4)//5 = ceil(2n/5)) — a
    // float 0.4*n would ceil differently across engines; the verify joins
    // run over FULL shingle sets, the prefixes only gate candidacy
    "q_jaccard_prefix" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(tk) - 1),
        |      i -> array_to_string(tk[i:i+2], ' '))) AS s
        |  FROM toks
        |), dfs AS (
        |  SELECT s, COUNT(*) AS df FROM sh GROUP BY 1
        |), sz AS (
        |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
        |), pref AS (
        |  SELECT doc_id, s FROM (
        |    SELECT sh.doc_id, sh.s, z.n,
        |      row_number() OVER (PARTITION BY sh.doc_id ORDER BY d.df, sh.s) AS rn
        |    FROM sh JOIN dfs d USING (s) JOIN sz z USING (doc_id))
        |  WHERE rn <= n + 1 - (2 * n + 4) // 5
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
        |), common AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |  JOIN cand ON cand.doc_a = x.doc_id AND cand.doc_b = y.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
        |  FROM common JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
        |WHERE jaccard >= 0.4 ORDER BY doc_a, doc_b""".stripMargin,
    // 4 unrolled fixed-point iterations: `//` (floor div) on non-negative
    // BIGINTs matches Spark's `div` exactly, so the replay is bit-identical
    "q_pagerank" -> {
      val iters = (1 to 4).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM(r.r // d.outdeg) AS contrib
           |  FROM edges e JOIN r${k - 1} r ON e.src = r.id
           |  JOIN deg d ON e.src = d.src GROUP BY 1),
           |r$k AS (SELECT d.src AS id,
           |    CAST(150000 + (850000 * COALESCE(c.contrib, 0)) // 1000000 AS BIGINT) AS r
           |  FROM deg d LEFT JOIN c$k c ON d.src = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey + 1000000 AS c, l_suppkey AS sup
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, sup AS dst FROM e0
         |          UNION ALL SELECT sup AS src, c AS dst FROM e0),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
         |$iters
         |SELECT id AS node_id, r AS rank_micro, CAST(1000000 AS BIGINT) AS unit FROM r4
         |ORDER BY rank_micro DESC, node_id""".stripMargin
      // the oracle's unit column pins the cross-engine contract: at this
      // node count PageRank.unitFor derives exactly the classic 1e6, so
      // the literal 150000/850000//1000000 constants above stay the very
      // arithmetic the Spark side ran
    },
    // BFS, unrolled min-union rounds over the q_pagerank graph CTEs: the
    // relational min-union is distance-equivalent to the Spark side's
    // frontier+anti-join formulation (BFS first-reach = min hops)
    "q_bfs_hops" -> {
      val rounds = (1 to 4).map { k =>
        s"""r$k AS (
           |  SELECT id, CAST(MIN(d) AS BIGINT) AS d FROM (
           |    SELECT id, d FROM r${k - 1}
           |    UNION ALL
           |    SELECT e.dst AS id, r.d + 1 AS d
           |    FROM edges e JOIN r${k - 1} r ON e.src = r.id)
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey + 1000000 AS c, l_suppkey AS sup
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT c AS src, sup AS dst FROM e0
         |          UNION ALL SELECT sup AS src, c AS dst FROM e0),
         |r0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d),
         |$rounds
         |SELECT id AS node_id, d AS hops FROM r4 ORDER BY node_id""".stripMargin
    },
    // Bellman-Ford, unrolled: weighted min-union relaxation per round over
    // integer costs 1000000 // cnt; both operands non-negative so // and
    // Spark's div agree
    "q_cheapest_path" -> {
      val rounds = (1 to 4).map { k =>
        s"""p$k AS (
           |  SELECT id, CAST(MIN(d) AS BIGINT) AS d FROM (
           |    SELECT id, d FROM p${k - 1}
           |    UNION ALL
           |    SELECT e.dst AS id, p.d + e.w AS d
           |    FROM ew e JOIN p${k - 1} p ON e.src = p.id)
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ecnt AS (
         |  SELECT o_custkey + 1000000 AS c, l_suppkey AS sup,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
         |ew AS (SELECT c AS src, sup AS dst, CAST(1000000 // cnt AS BIGINT) AS w FROM ecnt
         |       UNION ALL SELECT sup AS src, c AS dst, CAST(1000000 // cnt AS BIGINT) AS w FROM ecnt),
         |p0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d),
         |$rounds
         |SELECT id AS node_id, d AS cost FROM p4 ORDER BY node_id""".stripMargin
    },
    // integer epoch pivot and long-count shares: the only doubles are the
    // n/t divisions and ln(), identical IEEE ops in both engines
    "q_drift_psi" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |piv AS (SELECT (MIN(us) + MAX(us)) // 2 AS pv FROM e),
        |c AS (SELECT event_type,
        |        CAST(SUM(CASE WHEN us <= pv THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(SUM(CASE WHEN us > pv THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |      FROM e, piv GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
        |               CAST(SUM(n2) AS BIGINT) AS t2 FROM c)
        |SELECT event_type, n1, n2,
        |  round((greatest(n1 / t1, 1e-6) - greatest(n2 / t2, 1e-6))
        |        * ln(greatest(n1 / t1, 1e-6) / greatest(n2 / t2, 1e-6)), 6) AS psi
        |FROM c, tot ORDER BY event_type""".stripMargin,
    // integer tf/dl/df; doubles only in the closed-form score with the
    // same op order as the Spark column expression; ln() rounds at 6dp
    // before the ORDER BY, doc_id breaking rounded ties
    "q_bm25" -> {
      val score = Seq("hash", "vector", "window").map { t =>
        s"ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5)) * (tf_$t * 2.2)" +
          s" / (tf_$t + 1.2 * (0.25 + 0.75 * dl / avgdl))"
      }.mkString("\n  + ")
      val tfs = Seq("hash", "vector", "window").map { t =>
        s"    len(list_filter(toks, x -> x = '$t')) AS tf_$t"
      }.mkString(",\n")
      val dfs = Seq("hash", "vector", "window").map { t =>
        s"    CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t"
      }.mkString(",\n")
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, len(toks) AS dl,
         |$tfs
         |  FROM t),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         |$dfs
         |  FROM d)
         |SELECT doc_id, round($score, 6) AS bm25
         |FROM d CROSS JOIN st
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    },
    "q_filter_cascade" ->
      """SELECT source,
        |  CASE WHEN n_chars < 150 THEN 'too_short'
        |       WHEN lang NOT IN ('en', 'es', 'de', 'fr') THEN 'lang_excluded'
        |       WHEN CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE)
        |            / len(string_split_regex(trim(lower(text)), '\s+')) < 0.35 THEN 'repetitive'
        |       ELSE 'kept' END AS stage,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
