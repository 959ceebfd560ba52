package graft.tools
import org.apache.spark.sql.SparkSession
/** Run a query once (warm) and print the AQE final plan WITH runtime
  * metrics (rows/time per operator) — poor man's SQL tab.
  */
object MetricsDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.PlanLint.silenceBoundedWindowWarning()
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // cold
      val df = fn(spark, sfDir)
      df.count()
      println(s"==== $n ====")
      // executedPlan after execution carries per-operator metric values
      val ep = df.queryExecution.executedPlan
      def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
        val m = p.metrics.collect {
          case (k, v) if v.value > 0 &&
            (k.contains("numOutputRows") || k.contains("time") ||
             k.contains("Time") || k.contains("build")) =>
            s"$k=${v.value}"
        }.mkString(" ")
        println(("  " * d) + p.nodeName + " " + m)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan, d + 1)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan, d + 1)
          case _ => p.children.foreach(walk(_, d + 1))
        }
      }
      walk(ep, 0)
    }
    spark.stop()
  }
}
