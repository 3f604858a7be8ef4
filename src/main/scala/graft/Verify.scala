package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump each query's result under `outDir/<name>`; a query that THROWS
    * leaves a visible `_failed/<name>/error.txt` artifact instead of just
    * a stderr line — in round 4, 22 erroring queries were simply absent
    * from CORRECTNESS and read as reduced coverage, not red rows
    * (ADVICE r4). Returns the failed names (spec-tested).
    */
  def dumpQueries(spark: SparkSession, sfDir: String, outDir: String,
                  selected: Map[String, (SparkSession, String) => DataFrame]): Seq[String] = {
    var failed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
        val marker = Paths.get(s"$outDir/_failed/$name")
        Files.createDirectories(marker)
        Files.writeString(marker.resolve("error.txt"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
      spark.catalog.clearCache() // free per-query cached intermediates
    }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
          failed.sorted.mkString(", "))
    failed.sorted
  }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 75 queries x several codegen units each overflow the default
      // 100-entry codegen LRU, so the "steady" pass recompiles everything
      // (trivial queries were janino-bound, not data-bound)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      // the production install path: rule + SQL functions via extensions
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop (mirrors Bench): SPARK_GRAFT_ONLY=q_a,q_b dumps only the
    // named queries; unknown names fail loudly. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // mirror Bench: a set-but-empty value must fail loudly, not write
      // zero dumps next to a full oracle_sql.json and exit 0
      require(names.nonEmpty,
        "SPARK_GRAFT_ONLY is set but selects no queries (empty/whitespace)")
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names no such queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    dumpQueries(spark, sfDir, outDir, selected)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
