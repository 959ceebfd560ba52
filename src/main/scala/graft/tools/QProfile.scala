package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query time decomposition (optimization-round diagnostic): wall
  * time of a warm rep split into JOB time (executor-visible: from first
  * job start to last job end, plus per-job gaps) vs DRIVER gap (wall −
  * job wall: analysis, optimization, AQE re-planning, codegen compile,
  * scheduling that happens before/between jobs). Also totals task run
  * time, GC, and task count so executor work is attributable.
  *
  * Usage: runMain graft.tools.QProfile [sfDir] q_a q_b ...
  * (no names = the bench's headline subset).
  */
object QProfile {

  private final class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var jobWallNs = 0L
    @volatile var tasks = 0
    @volatile var taskRunMs = 0L
    @volatile var gcMs = 0L
    @volatile var deserMs = 0L
    @volatile var stages = 0
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobStart.put(e.jobId, System.nanoTime()); ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val s = jobStart.remove(e.jobId)
      if (s != null) { jobs += 1; jobWallNs += System.nanoTime() - s }
    }
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      val si = e.stageInfo
      val m = si.taskMetrics
      val nm = si.details.split('\n')
        .find(l => l.contains("graft.") && !l.contains("graft.tools"))
        .map(_.trim.take(90)).getOrElse(si.name.take(60))
      stageRows.add(f"      stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
        f"run=${m.executorRunTime}%6dms deser=${m.executorDeserializeTime}%6dms " +
        f"gc=${m.jvmGCTime}%5dms cpu=${m.executorCpuTime / 1000000}%6dms " +
        f"shufW=${m.shuffleWriteMetrics.bytesWritten}%9d $nm")
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        tasks += 1
        taskRunMs += m.executorRunTime
        gcMs += m.jvmGCTime
        deserMs += m.executorDeserializeTime
      }
    }
    def reset(): Unit = {
      jobs = 0; jobWallNs = 0L; tasks = 0; taskRunMs = 0L; gcMs = 0L
      deserMs = 0L; stages = 0; jobStart.clear(); stageRows.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, names0) = args.toList match {
      case d :: rest if d.startsWith("/") => (d, rest)
      case rest => ("/root/testdata/sf0.1", rest)
    }
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
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())

    val names =
      if (names0 == List("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (names0.nonEmpty) names0
      else Seq("q_curation_pipeline", "q_contamination", "q_contamination_fuzzy",
        "q_dedup_incremental", "q_span_docs", "q_ann_lsh", "q_shift_global",
        "q_overlap_within_mult", "q1_agg", "q_topk", "q_keyby", "q_froll_mean")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    println(f"${"query"}%-28s ${"wall"}%8s ${"jobW"}%8s ${"drvGap"}%8s " +
      f"${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskMs"}%8s ${"gcMs"}%6s " +
      f"${"buildS"}%7s ${"optS"}%7s")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      graft.Fits.clearAll()
      fn(spark, sfDir).count() // cold
      // 3 warm reps, report the median rep's decomposition
      val reps = (1 to 3).map { _ =>
        org.apache.spark.sql.GraftSqlBridge.flushListenerBus(
          spark.sparkContext, 5000L)
        acc.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.GraftSqlBridge.flushListenerBus(
          spark.sparkContext, 5000L)
        (wall, acc.jobWallNs / 1e9, acc.jobs, acc.stages, acc.tasks,
          acc.taskRunMs, acc.gcMs)
      }
      val r = reps.sortBy(_._1).apply(1)
      // split the driver gap: DSL build (fn call) / analyze+optimize
      // (force optimizedPlan) / everything else (physical planning,
      // AQE loop, codegen, scheduling)
      val b0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val b1 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val b2 = System.nanoTime()
      println(f"$name%-28s ${r._1}%8.3f ${r._2}%8.3f ${r._1 - r._2}%8.3f " +
        f"${r._3}%5d ${r._4}%4d ${r._5}%6d ${r._6}%8d ${r._7}%6d " +
        f"${(b1 - b0) / 1e9}%7.3f ${(b2 - b1) / 1e9}%7.3f")
      if (sys.env.contains("GRAFT_QPROFILE_STAGES"))
        acc.stageRows.forEach(println) // per-stage rows of the LAST rep
    }
    spark.stop()
  }
}
