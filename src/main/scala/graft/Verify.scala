package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only; the driver passes two):
    // comma-separated query names to dump instead of the full set
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PlanLint.silenceBoundedWindowWarning()
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a plan-build throw happens BEFORE overwrite clears the target:
        // drop any stale dump from a previous run into the same outDir,
        // or a per-dir comparator would silently pass on old data
        deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // stdout, not just stderr: a throwing query creates no dump dir and
    // would otherwise disappear from downstream per-dir comparators.
    if (failed.nonEmpty)
      println(s"[verify] ${failed.size} queries threw (no dump written): " +
        failed.sorted.mkString(", "))
    // Full driver runs also lint every registered plan (PlanLint rules:
    // no unbounded cross products, no global windows over unbounded
    // input) so the round's correctness artifact is self-verifying on
    // plan SHAPE, not just values. Fits are session-memoized, so the
    // rebuild costs plan analysis only.
    if (only.isEmpty) {
      val violations = PlanLint.lintAll(spark, sfDir)
      println(s"[verify] planlint: ${violations.size} violations across " +
        s"${SparkEntry.queries.size} plans" +
        (if (violations.nonEmpty) violations.mkString(" — ", "; ", "") else ""))
    }
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

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
