package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per suite (lazy — built on first use). */
trait SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // same install path as Verify/Bench: rule + SQL functions via extensions
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
