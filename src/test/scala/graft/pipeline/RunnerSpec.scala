package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class RunnerSpec extends AnyFunSuite with SparkSuite {

  private def inputs = Runner.Inputs(
    nplCsv = fixture("npl_raw_mini.csv"),
    flowrateGrossNewJson = fixture("flowrate_gross_new_npl.json"),
    flowrateGrossJson = fixture("flowrate_gross_npl.json"),
    flowratePctJson = fixture("flowrate_pct_npl.json"),
    gdpPath = fixture("gdp_raw_mini.csv"),
    gdpIsXlsx = false,
    inflationCsv = fixture("inflation_mini.csv"),
    mrrPagesJson = Seq(fixture("mrr_api_2013_01.json"), fixture("mrr_api_2013_02.json")),
    minpayCsv = fixture("minpay.csv"),
    shockCsv = fixture("shock.csv"))

  test("full extract→transform→load run writes three readable marts") {
    val outBase = java.nio.file.Files.createTempDirectory("graft_run").toString
    val written = Runner.run(spark, inputs, outBase)
    assert(written.keySet == Set("housing", "automobile", "credit_card"))
    written.foreach { case (seg, dir) =>
      assert(dir.startsWith(s"$outBase/${seg}_processed_"))
      val back = spark.read.option("header", "true").csv(dir)
      assert(back.count() > 0)
    }
    // the housing mart survives the CSV round-trip with its golden cell
    val housing = spark.read.option("header", "true").csv(written("housing"))
    val q1 = housing.filter(housing("Quarter") === "2013-Q1").collect().head
    assert(math.abs(q1.getAs[String]("% to Total Loans").toDouble - 0.0234) < 1e-9)
    assert(q1.getAs[String]("Gross NPL").toDouble == 32076.0)
  }
}
