package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Normalize
import graft.ops.{Ordered, Reshape, Scalar}

/** Reference-fidelity recreation of the NPL analytics pipeline
  * (src/ETL-NPL-Pipeline.py) on its own hostile raw layouts — the §3.1-§3.3
  * entry points, validated against the notebook's golden outputs
  * (FIXTURES.md B1-B7).
  *
  * Ingestion normalization (header games, row positions) happens once at the
  * edge; everything after is declarative DataFrame ops, so Catalyst prunes
  * and pushes down — unlike the reference, which materializes eight
  * defensive copies (src:126-429, SURVEY.md §4).
  */
object Npl {

  /** Ordinal-preserving raw CSV read: `_idx` is the 0-based FILE-ORDER
    * ordinal (matching [[graft.sources.Xlsx.readSheetDf]]), contiguous even
    * when the scan splits the file. For a single file, split index follows
    * byte offset and `monotonically_increasing_id` encodes
    * (split << 33 | row-in-split), so ordering by it reproduces file order;
    * `Normalize.withOrdinal`'s row_number then makes the ordinal contiguous
    * (the raw id is not across splits). The un-partitioned window is a
    * single-task sort — correct for ingest-sized header-bearing files
    * (Normalize's scale note), not for large data tables.
    */
  private def rawWithIdx(s: SparkSession, path: String, nCols: Int): DataFrame =
    Normalize.withOrdinal(Normalize.readRawCsv(s, path, nCols),
        monotonically_increasing_id())
      .withColumn("_idx", (col("_idx") - 1).cast("long"))

  /** B1 / §3.1 `npl_transform` (src/ETL-NPL-Pipeline.py:121-191): the BOT
    * Gross-NPL export with merged-cell two-level headers, revision markers,
    * comma-formatted numerics and Source:/Remark: trailer rows -> one clean
    * table per category row, columns
    * (Category, Quarter, % to Total Loans, Gross NPL, Total Loan).
    */
  def nplTransform(s: SparkSession, path: String, nCols: Int = 13): DataFrame = {
    val raw = rawWithIdx(s, path, nCols)
    // rows 4-5 are the two header levels (src:125-127) — driver-side, 2 rows
    val hdr = raw.filter(col("_idx").isin(4, 5)).orderBy("_idx")
      .drop("_idx").collect()
    val cells = (r: Int) => (1 until nCols).map(c => Option(hdr(r).getString(c)).getOrElse(""))
    // horizontal ffill of merged quarter labels (src:131), strip revision
    // markers + trim (src:134), reformat Qx/YYYY -> YYYY-Qx (src:63-67,137)
    val quarters = cells(0).scanLeft("") { (prev, c) =>
      if (c.trim.nonEmpty) c else prev
    }.tail.map(q => q.trim.replaceAll("\\s*(r1|p1|r|p)$", "")
      .replaceAll("^Q(\\d)/(\\d{4})$", "$2-Q$1"))
    val measures = cells(1).map(_.trim)
    val qm = quarters.zip(measures)
    // body: category rows only — drop title/trailer rows (src:125-126,152)
    val body = raw.filter(col("_idx") > 5 &&
      !col("_c0").startsWith("Source") && !col("_c0").startsWith("Remark") &&
      col("_c0").isNotNull && trim(col("_c0")) =!= "")
    // keep only the columns whose measure != '% to NPLs' (mask P4, src:144-145)
    val keep = qm.zipWithIndex.collect {
      case ((q, m), i) if m != "% to NPLs" => (s"_c${i + 1}", s"$q::$m")
    }
    val named = keep.foldLeft(body.select(
        (trim(col("_c0")).as("Category") +: keep.map { case (c, _) => col(c) }): _*)) {
      case (d, (old, nw)) => d.withColumnRenamed(old, nw)
    }
    // stack (src:160) -> split the two header levels -> pivot (src:163-165)
    val long = Reshape.unpivotWide(named, Seq("Category"), keep.map(_._2), "qm", "Value")
      .withColumn("Quarter", split(col("qm"), "::").getItem(0))
      .withColumn("Type", split(col("qm"), "::").getItem(1))
    val wide = Reshape.pivotLong(long.select("Category", "Quarter", "Type", "Value"),
      Seq("Category", "Quarter"), "Type",
      Seq("NPL Outstanding", "% to Total Loans"), first(col("Value")))
    // casts + derived Total Loan (src:169-176)
    wide
      .withColumn("% to Total Loans", Scalar.pctToRatio(col("% to Total Loans")))
      .withColumn("Gross NPL", Scalar.deComma(col("NPL Outstanding")))
      .drop("NPL Outstanding")
      .withColumn("Total Loan", col("Gross NPL") / col("% to Total Loans"))
  }

  /** Per-segment split by substring match (src:180-189). */
  def nplSegments(all: DataFrame): Map[String, DataFrame] =
    Seq("Housing", "Automobile", "Credit Card").map { seg =>
      seg -> all.filter(col("Category").contains(seg)).drop("Category")
    }.toMap

  /** BOT observations payload -> (period_start, value) rows
    * (`observations_bot` JSON path result.series[0].observations, src:106).
    */
  def observations(s: SparkSession, path: String): DataFrame =
    s.read.option("multiLine", "true").json(path)
      .select(explode(col("result.series")).as("ser"))
      .select(explode(col("ser.observations")).as("obs"))
      .select(col("obs.period_start").as("period_start"), col("obs.value").as("value"))

  /** B2 / §3.2 flowrate (src:200-261): three series, two chained inner
    * joins, derived Total Loan and Flowrate Ratio.
    */
  def flowrateTransform(s: SparkSession, grossNewPath: String, grossPath: String,
                        pctPath: String): DataFrame = {
    val gn = observations(s, grossNewPath)
      .select(col("period_start"), col("value").cast("double").as("Gross New NPL"))
    val g = observations(s, grossPath)
      .select(col("period_start"), col("value").cast("double").as("Gross NPL"))
    val p = observations(s, pctPath)
      .select(col("period_start"), col("value").cast("double").as("pct_npl"))
    gn.join(g, Seq("period_start"), "inner").join(p, Seq("period_start"), "inner")
      .withColumn("Total Loan", col("Gross NPL") / (col("pct_npl") / 100))
      .withColumn("Flowrate Ratio", col("Gross New NPL") / col("Total Loan"))
      .select(trim(col("period_start")).as("Quarter"), col("Flowrate Ratio"))
  }

  /** B3 gdp_transform (src:364-410): positional projection of columns 0 and
    * 11, revision-marker strip, the imperative year fill-down as a window,
    * year-header rows dropped by string length, percent -> ratio.
    */
  def gdpTransform(s: SparkSession, path: String, nCols: Int = 14): DataFrame =
    gdpTransformFrom(rawWithIdx(s, path, nCols))

  /** Same transform over the reference's actual source format — the NESDC
    * Excel workbook (src:48-54,513) — via the JDK-only XLSX reader, which
    * emits the identical `_c0.._cN + _idx` shape.
    */
  def gdpTransformXlsx(s: SparkSession, path: String, sheet: String = "sheet1"): DataFrame =
    gdpTransformFrom(graft.sources.Xlsx.readSheetDf(s, path, sheet))

  /** Core of the GDP transform over any positional raw frame. */
  def gdpTransformFrom(rawAll: DataFrame): DataFrame = {
    val raw = rawAll.filter(col("_idx") >= 4)
    val labeled = raw.select(col("_idx"),
      Scalar.stripRevision(col("_c0")).as("label"),
      col("_c11").as("gdp_raw"))
    labeled
      .withColumn("year", Ordered.carryYear(col("label"), Seq(col("_idx"))))
      .filter(length(col("label")) =!= 4) // drop year header rows (src:407)
      .select(concat(col("year"), lit("-"), col("label")).as("Quarter"),
        Scalar.pctToRatio(col("gdp_raw")).as("GDP Growth"))
  }

  /** B4 inflation_transformation (src:336-355): d/M/yy parse, percent ->
    * ratio, monthly -> quarterly mean.
    */
  def inflationTransform(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    Normalize.readCsv(s, path,
        StructType.fromDDL("`Time` STRING, `Inflation Rate` STRING"))
      .select(Scalar.toQuarter(to_date(col("Time"), "d/M/yy")).as("Quarter"),
        Scalar.pctToRatio(col("Inflation Rate")).as("rate"))
      .groupBy("Quarter").agg(avg(col("rate")).as("Inflation Rate"))
  }

  /** BOT avg_loan_rate page -> data_detail rows (src:326 json_normalize). */
  def mrrPage(s: SparkSession, path: String): DataFrame =
    s.read.option("multiLine", "true").json(path)
      .select(explode(col("result.data.data_detail")).as("d"))
      .select(col("d.period").as("period"), col("d.name_eng").as("name_eng"),
        col("d.mrr").as("mrr"))

  /** B5 interest_bot + mrr_transformation (src:271-327,420-447): union of
    * month pages (O3), foreign-branch filter (src:426), daily -> quarterly
    * mean of mrr/100.
    */
  def mrrTransform(s: SparkSession, paths: Seq[String]): DataFrame =
    paths.map(mrrPage(s, _)).reduce(_.unionByName(_))
      .filter(col("name_eng") =!= "Average of Foreign Bank Branches")
      .select(Scalar.toQuarter(to_date(col("period"), "yyyy-MM-dd")).as("Quarter"),
        Scalar.pctToRatio(col("mrr")).as("mrr_ratio"))
      .groupBy("Quarter").agg(avg(col("mrr_ratio")).as("MRR"))

  /** B6 passthrough series (src:560,586,673,682). */
  def minpayTransform(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    Normalize.readCsv(s, path, StructType.fromDDL("`Quarter` STRING, `Min Payment` STRING"))
      .select(col("Quarter"), Scalar.pctToRatio(col("Min Payment")).as("Min Payment"))
  }

  def shockLoad(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    Normalize.readCsv(s, path,
      StructType.fromDDL("`Quarter` STRING, `Macro Shock Index` BIGINT"))
  }

  /** B7 / §3.3 mart assembly (src:706-728): common macro panel + the three
    * segment marts, all full-outer on the coalesced Quarter key.
    */
  def assembleMarts(npl: Map[String, DataFrame], flowrate: DataFrame,
                    gdp: DataFrame, inflation: DataFrame, shock: DataFrame,
                    mrr: DataFrame, minpay: DataFrame): Map[String, DataFrame] = {
    val common = flowrate
      .join(gdp, Seq("Quarter"), "full_outer")
      .join(inflation, Seq("Quarter"), "full_outer")
      .join(shock, Seq("Quarter"), "full_outer")
    Map(
      "housing" -> npl("Housing").join(common, Seq("Quarter"), "full_outer")
        .join(mrr, Seq("Quarter"), "full_outer").orderBy("Quarter"),
      "automobile" -> npl("Automobile").join(common, Seq("Quarter"), "full_outer")
        .orderBy("Quarter"),
      "credit_card" -> npl("Credit Card").join(common, Seq("Quarter"), "full_outer")
        .join(minpay, Seq("Quarter"), "full_outer").orderBy("Quarter"))
  }
}
