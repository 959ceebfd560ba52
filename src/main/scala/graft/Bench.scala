package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warmup action runs first so the first timed query doesn't absorb
  * session/codegen/parquet-footer startup; queries run in sorted name
  * order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table's footer + JIT the scan path.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // db-benchmark convention: two runs per query, report the second
    // (steady-state) — the first run is dominated by per-query-shape
    // whole-stage-codegen JIT, not execution.
    // a failed query reports -1 (never a plausible-looking duration)
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = timeOnce(name, fn)
      val warm = timeOnce(name, fn)
      (name, cold, warm)
    }
    val qs = results.map { case (k, _, w) => "\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","run":"second-of-two","cold_total":$coldTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
