package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for selected queries to
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * artifact (the judge reads plan claims off these files).
  *
  * Usage: runMain graft.tools.PlanSnap <sfDir> <tag> <suffix> q_a q_b ...
  * e.g.   runMain graft.tools.PlanSnap /root/testdata/sf0.1 r21 before q_shift_global
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "PlanSnap <sfDir> <tag> <suffix> <q>...")
    val (sfDir, tag, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.PlanLint.silenceBoundedWindowWarning()
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(dir.resolve(s"${n}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote ${dir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
