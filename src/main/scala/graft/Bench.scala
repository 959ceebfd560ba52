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

  /** Parse a committed BENCH_DETAIL.json with Jackson (Spark's own JSON
    * library — the former regex scraper silently dropped entries whose
    * field order drifted): returns (sf, load_contaminated, warm-by-name
    * for non-failed queries), or None for unreadable/shapeless input.
    */
  private[graft] def parsePrevArtifact(
      txt: String): Option[(String, Boolean, Map[String, Double])] = {
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val sfNode = root.get("sf")
      val qsNode = root.get("queries")
      if (sfNode == null || qsNode == null || !qsNode.isObject) None
      else {
        val contaminated = {
          val c = root.get("load_contaminated")
          c != null && c.asBoolean(false)
        }
        val m = Map.newBuilder[String, Double]
        qsNode.properties().forEach { e =>
          val w = e.getValue.get("warm")
          if (w != null && w.isNumber && w.asDouble() >= 0)
            m += e.getKey -> w.asDouble()
        }
        Some((sfNode.asText(), contaminated, m.result()))
      }
    } catch { case _: Throwable => None }
  }

  /** The vs-previous-artifact regression gate. A clean sweep compares
    * its warm MEDIAN at 2x (after re-measuring). A load-contaminated
    * sweep — where every query already runs 5 reps — compares its MIN
    * rep at 3x: external load only ever ADDS time, so a min that still
    * exceeds 3x the previous clean median is a regression the load
    * cannot explain, closing the blind spot where contaminated sweeps
    * skipped the gate entirely. Sub-50ms values stay ungated (pure
    * scheduler noise at this scale).
    */
  private[graft] def vsPrevRegressed(med: Double, minRep: Double,
                                     prev: Double,
                                     loadContaminated: Boolean): Boolean =
    if (loadContaminated) minRep > 3.0 * prev && minRep >= 0.05
    else med > 2.0 * prev && med >= 0.05

  /** A rep is steal-poisoned when the HOST took more than 5% of the
    * machine's cpu-jiffy capacity (`sec × USER_HZ × ncpus`, USER_HZ=100)
    * during it — the sustained-steal contamination observed in rounds
    * 9-14 inflated reps 2-12×, far past this bar — and at least 2
    * jiffies in absolute terms, so sub-tick accounting jitter can't
    * poison a sub-100 ms rep.
    */
  private[graft] def stealPoisoned(sec: Double, steal: Long,
                                   ncpus: Int): Boolean =
    steal >= 2 && sec > 0 &&
      steal.toDouble / (sec * 100.0 * ncpus) > 0.05

  /** Partition measured reps by steal poisoning. `kept` is what warm
    * stats should run on: the clean reps, or — when EVERY rep was
    * poisoned, so exclusion would leave nothing — all of them (the
    * caller then reports the MIN, steal only ever adds time, and flags
    * the query). `stealJiffies` totals the host's take across all reps
    * for the artifact record.
    */
  private[graft] final case class StealSplit(kept: Seq[Double], stolen: Int,
                                             stealJiffies: Long,
                                             allStolen: Boolean)
  private[graft] def splitStolen(reps: Seq[(Double, Long)],
                                 ncpus: Int): StealSplit = {
    val (stolen, clean) =
      reps.partition { case (s, j) => stealPoisoned(s, j, ncpus) }
    val total = reps.map(_._2).filter(_ > 0).sum
    if (clean.isEmpty)
      StealSplit(reps.map(_._1), stolen.size, total, stolen.nonEmpty)
    else StealSplit(clean.map(_._1), stolen.size, total, allStolen = false)
  }

  /** Deterministic per-query SHUFFLE-BYTE meter: a listener records every
    * completed stage's shuffle write bytes, keyed by stageId with the MAX
    * across stage ATTEMPTS — a load-induced stage retry re-fires
    * onStageCompleted for the same stageId, and summing attempts would
    * double-count the re-executed tasks (round 15's contaminated sweep
    * recorded q_curation_pipeline at +72% bytes this way, breaking the
    * "bytes are a property of the plan" invariant the meter exists for).
    * Max-per-stageId is robust in both retry shapes: attempt 0 completed
    * and a downstream fetch failure re-ran a subset (max picks attempt
    * 0's full volume), or attempt 0 died early and attempt 1 wrote the
    * full volume (max picks attempt 1). Bytes are a property of the PLAN
    * and the data, not of machine load — so unlike warm timings they
    * regress noiselessly: a plan change that adds shuffle volume shows as
    * an exact byte delta in the artifact, no re-measuring, no
    * steal/loadavg caveats. `snapshot()` drains the async listener bus
    * before reading.
    */
  /** Stage callsite → JSON-string-safe text: truncate BEFORE escaping
    * (cutting after could split an escape pair, "\\" → lone "\"), then
    * flatten ALL control chars (< 0x20: \n, \t, \r, ...) to a space —
    * callsite/details text can carry tabs/CRs, and any raw control byte
    * inside a JSON string is invalid (ADVICE r17) — then escape
    * backslash and quote.
    */
  private[graft] def escapeStageName(nm0: String): String =
    nm0.take(90).map(c => if (c < ' ') ' ' else c)
      .replace("\\", "\\\\").replace("\"", "\\\"")

  private[graft] final class ShuffleMeter(sc: org.apache.spark.SparkContext)
      extends org.apache.spark.scheduler.SparkListener {
    private val perStage =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    /** Sweep-loop attribution tag (query name + cold/warm phase), read by
      * the async listener thread at event DELIVERY time. The round-16
      * judge found the driver's artifact disagreeing with two in-sandbox
      * sweeps on 90 queries' bytes while each environment is internally
      * deterministic; the sidecar built from these tagged events is the
      * diagnostic: a duplicate (stageId, attempt) row = double-fired
      * completion events, a stage tagged to the NEXT query = the listener
      * bus drained after `snapshot()`'s flush window (attribution slip),
      * and a per-query stage set that differs across environments = a
      * genuinely different physical shape (e.g. env-dependent AQE or fit
      * convergence). One sweep per environment pins the mechanism.
      */
    @volatile private[graft] var tag: String = "startup"
    private val events =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sc.addSparkListener(this)
    /** Testable accounting core: retried attempts of one stageId merge by
      * max instead of summing. Completed actions never straddle a
      * snapshot (snapshot drains the bus after the action returns), so
      * the per-query delta discipline in main() is unaffected.
      */
    private[graft] def record(stageId: Int, bytes: Long): Unit = {
      perStage.merge(stageId, Long.box(bytes),
        (a, b) => Long.box(math.max(a, b)))
      ()
    }
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val bytes = si.taskMetrics.shuffleWriteMetrics.bytesWritten
      record(si.stageId, bytes)
      // Stage callsite, when informative: AQE SQL stages all submit from
      // the shared thread pool (si.name AND si.details both show
      // "withThreadLocalCaptured at CompletableFuture...", no user
      // frames), so those emit no name; RDD-level jobs (fwrite
      // post-passes, checkpoint builds) get their real callsite, which
      // is enough to attribute non-SQL volume in a sidecar diff.
      val nm0 = si.details.split('\n')
        .find(l => l.contains("graft.") && !l.contains("graft.Bench"))
        .map(_.trim).getOrElse(si.name)
      val nm =
        if (nm0.contains("withThreadLocalCaptured")) ""
        else "," + s""""name":"${escapeStageName(nm0)}""""
      events.add(s"""{"q":"$tag","stage":${si.stageId},"attempt":${
        si.attemptNumber()},"tasks":${si.numTasks},"bytes":$bytes$nm}""")
      ()
    }
    /** Dump every stage-completion event seen this sweep (in listener
      * delivery order) plus an environment header, so two environments'
      * sidecars diff line-by-line.
      */
    def writeEvents(path: java.nio.file.Path): Unit = {
      val rt = Runtime.getRuntime
      val header = s"""{"env":{"ncpus":${rt.availableProcessors()},"max_heap_mb":${
        rt.maxMemory() / (1024 * 1024)},"spark":"${sc.version}"}}"""
      val sb = new StringBuilder(header).append('\n')
      events.forEach(l => { sb.append(l).append('\n'); () })
      java.nio.file.Files.write(path, sb.toString.getBytes("UTF-8"))
      ()
    }
    def snapshot(): Long = {
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(sc, 10000L)
      var t = 0L
      perStage.values.forEach(v => t += v.longValue())
      t
    }
  }

  /** Shuffle-byte drift vs the previous artifact: real plan-volume
    * changes, not rounding — both sides measured, ratio past 1.3× in
    * either direction, and at least 8 KB apart (tiny queries reshuffle
    * a few hundred bytes of metadata that legitimately wobbles with AQE
    * decisions; 8 KB is the same absolute floor ShuffleBudgetSpec proved
    * right-sized at sf0.001, and the sf0.1 sweep's MEDIAN query writes
    * only ~263 bytes, so a percent-of-median floor degenerates to the
    * absolute one). Round 16's flat 1 MB floor exceeded the entire byte
    * volume of ~90% of the sf0.1 suite and let a 90-query
    * builder-vs-driver disagreement (deltas −62%..+70%) pass with zero
    * flags — Round17Spec replays that artifact pair against this rule.
    */
  private[graft] def shufDrifted(cur: Long, prev: Long): Boolean =
    cur > 0 && prev > 0 &&
      (cur > prev * 1.3 || cur < prev / 1.3) &&
      math.abs(cur - prev) > 8192L

  /** Queries whose byte volume is legitimately BIMODAL: the exact
    * allowed value set per query. q_curation_pipeline flips between two
    * volumes depending on whether one 677 KB AQE anti-join exchange runs
    * (pinned by graft.CurationPlanDiff: it is elided when
    * q_contamination ran earlier in the session and its fit exchange
    * reuses; results are oracle-identical both ways). A flip WITHIN the
    * set annotates (`shuf_bimodal`) instead of flagging; any THIRD value
    * still fires `shuf_changed` — a registry entry documents a pinned
    * mechanism, it does not widen the gate (VERDICT r17 "What's wrong"
    * #2). Values are properties of the current plan; a code change that
    * moves both modes goes stale here and fires until re-pinned.
    */
  private[graft] val knownBimodal: Map[String, Set[Long]] = Map(
    "q_curation_pipeline" -> Set(941626L, 1618684L))

  /** [[shufDrifted]] with the bimodal registry: a (cur, prev) pair both
    * inside the query's registered value set never flags.
    */
  private[graft] def shufDriftedRegistered(q: String, cur: Long,
                                           prev: Long): Boolean =
    !knownBimodal.get(q).exists(s => s.contains(cur) && s.contains(prev)) &&
      shufDrifted(cur, prev)

  /** True when a (cur, prev) drift was suppressed as a registered
    * bimodal flip — surfaced in the artifact as `shuf_bimodal` so the
    * flip stays visible without crying wolf.
    */
  private[graft] def shufBimodal(q: String, cur: Long, prev: Long): Boolean =
    cur != prev && shufDrifted(cur, prev) &&
      knownBimodal.get(q).exists(s => s.contains(cur) && s.contains(prev))

  /** Previous artifact's per-query cold-run shuffle write bytes (same
    * Jackson discipline as [[parsePrevArtifact]]; bytes are valid even
    * from a load-contaminated sweep, so no contamination filter).
    */
  private[graft] def parsePrevShuffle(txt: String): Map[String, Long] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val qsNode = root.get("queries")
      if (qsNode == null || !qsNode.isObject) Map.empty
      else {
        val m = Map.newBuilder[String, Long]
        qsNode.properties().forEach { e =>
          val s = e.getValue.get("shuf_w")
          if (s != null && s.isNumber && s.asLong() >= 0)
            m += e.getKey -> s.asLong()
        }
        m.result()
      }
    } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 32 = the driver's local[32] contract. The original stub
    // default of 4 is what produced round 16's 90-query shuffle-byte
    // "environment disagreement": builder sweeps ran argless (local[4],
    // 4 shuffle partitions) while the driver ran local[32] — partition
    // count changes per-partition framing overhead and AQE stage
    // shapes, so the two sweeps' byte channels couldn't agree. A
    // local[32] sweep on a DIFFERENT host with re-materialized testdata
    // reproduces the driver's r16 bytes on 82/90 of that disputed set.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PlanLint.silenceBoundedWindowWarning()

    // Warmup: touch every table's footer + JIT the scan path. Guarded so
    // one unloadable table degrades to slower first timings for its
    // queries instead of zeroing out the entire bench (round-7 rc:1 was
    // exactly this: an events-loader analysis error in this loop).
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
    }

    // db-benchmark convention, hardened against run-to-run jitter: one
    // cold run (absorbs per-query-shape whole-stage-codegen JIT), then
    // THREE warm runs reporting their median — single-run warm timings
    // made q_join_* look regressed in round 4 on pure scheduler noise.
    // a failed query reports -1 (never a plausible-looking duration)
    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
    }
    // conventional midpoint median: even sizes average the two middle
    // elements (picking the upper one biases high)
    def medianOf(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0
      else {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    // Optional positional args = query-name filter for targeted
    // profiling runs (the driver invokes with no args → full sweep).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Machine-load guard: a loaded driver machine can record a rep at
    // >10x its true cost (the round-9 official artifact carried
    // q_dedup_exact at 11.8x, and round-10's carried
    // q_contamination_bloom at 4.9x with all three reps uniformly slow
    // — dispersion alone cannot catch sustained load). Defenses:
    // (a) the 1-minute loadavg is recorded at sweep start/end;
    // (b) any query whose warm reps disperse beyond 3x is re-measured
    //     with two extra reps and flagged "noisy" if it survives;
    // (c) when loadavg at sweep start exceeds ncpus/8 the whole sweep
    //     is stamped load_contaminated: every query runs 5 warm reps,
    //     is flagged noisy, and reports the MIN rep as its warm value
    //     (external load only ever adds time, so min is the best
    //     estimator of the code's cost; the median is recorded
    //     alongside for transparency);
    // (d) independent of loadavg, a query whose warm median lands >2x
    //     its value in the previous committed BENCH_DETAIL.json gets
    //     two extra reps; if the regression survives, the entry is
    //     flagged vs_prev and carries prev + min so a judge can
    //     distinguish noise from a real regression without
    //     re-measuring;
    // (e) PER-REP steal attribution: /proc/stat's steal counter is read
    //     around every warm rep; poisoned reps (see stealPoisoned) are
    //     excluded from warm stats and re-run once, and each affected
    //     query records steal/stolen_reps fields — so a judge reads the
    //     contamination off the artifact instead of re-measuring
    //     (rounds 9-14 each needed a manual re-bench for exactly this).
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Host-level CPU steal (virtualized runners): /proc/stat's 8th cpu
    // field. A steal delta over the sweep is recorded so a judge can
    // attribute roaming per-query slowdowns to the HOST taking cycles
    // (observed as 2-4x inflation of alphabetically-contiguous query
    // stretches) rather than to the code under test — loadavg cannot
    // see steal, so the contamination stamp alone misses it.
    def stealJiffies(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    def dispersed(xs: Seq[Double]): Boolean =
      xs.nonEmpty && xs.max >= 0.05 && xs.max / math.max(xs.min, 0.005) > 3.0
    // previous committed artifact (read BEFORE this sweep overwrites it);
    // only comparable when it was recorded at the SAME sf directory AND
    // unloaded: a load-contaminated artifact stores min-of-5 warm values
    // — comparing a clean sweep's median against a min is unlike-vs-like
    // and would over-trigger the 2x gate generation after generation
    val prevTxt: Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_DETAIL.json")), "UTF-8"))
      catch { case _: Throwable => None }
    val prevWarm: Map[String, Double] =
      prevTxt.flatMap(parsePrevArtifact) match {
        case Some((sf, contaminated, warm))
          if sf == sfDir && !contaminated => warm
        case _ => Map.empty[String, Double]
      }
    // shuffle bytes compare load-free, but only at the same sf
    val prevShuf: Map[String, Long] =
      prevTxt.flatMap(parsePrevArtifact) match {
        case Some((sf, _, _)) if sf == sfDir =>
          prevTxt.map(parsePrevShuffle).getOrElse(Map.empty)
        case _ => Map.empty
      }
    val ncpus = Runtime.getRuntime.availableProcessors()
    val loadStart = loadavg()
    val stealStart = stealJiffies()
    val loadContaminated = loadStart > ncpus / 8.0
    if (loadContaminated) System.err.println(
      s"[bench] loadavg $loadStart > ${ncpus / 8.0} at sweep start: " +
        "stamping every query noisy and reporting min-of-5 warm reps")
    final case class QRes(name: String, cold: Double, warm: Double,
                          noisy: Boolean, vsPrev: Option[Double],
                          median: Double, minRep: Double,
                          stealJiffies: Long, stolenReps: Int,
                          allStolen: Boolean, shufW: Long)
    val meter = new ShuffleMeter(spark.sparkContext)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // shuffle bytes measured across the COLD run (warm reps repeat the
      // same volume; one snapshot pair keeps the meter overhead at one
      // listener-bus drain per query)
      // tag flips AFTER each snapshot's bus drain: events flushed by the
      // pre-cold snapshot still carry the previous query's "|warm" tag.
      // A straggler that outlives even that drain inherits the next
      // query's tag, but its stageId stays in the earlier query's range
      // (stageIds are session-global and monotonic), so slips remain
      // detectable in the sidecar by tag/stageId disagreement.
      //
      // Cleared-cold discipline (round 17): session fit memos are
      // dropped before every cold run, so shuf_w is each query's FULL
      // plan volume (fit builds included) — a pure function of (code,
      // data, query), independent of which queries ran earlier in the
      // sweep or of anything the environment ran before it. The round-16
      // cross-environment byte reconciliation traced every real
      // disagreement to exactly this history dependence (whether a
      // memoized fit's build stage landed inside a query's cold window
      // varied with sweep shape); ShuffleBudgetSpec proved cleared-cold
      // volumes byte-stable across ~50 calibration reps. Warm reps run
      // with the cold rep's fits memoized, so warm timings — the
      // headline metric — keep their steady-state meaning.
      Fits.clearAll()
      val shuf0 = meter.snapshot()
      meter.tag = name + "|cold"
      val cold = timeOnce(name, fn)
      val shufW = math.max(0L, meter.snapshot() - shuf0)
      meter.tag = name + "|warm"
      // every warm rep carries its own steal window (defense (e))
      def rep(): (Double, Long) = {
        val s0 = stealJiffies()
        val t = timeOnce(name, fn)
        val s1 = stealJiffies()
        (t, if (s0 >= 0 && s1 >= 0) math.max(0L, s1 - s0) else 0L)
      }
      // failed runs (-1) are excluded from the median so a transient
      // flake can't masquerade as a fast duration; all-failed → -1
      var raw = Vector.empty[(Double, Long)]
      def measure(n: Int): Unit =
        raw = raw ++ (1 to n).map(_ => rep()).filter(_._1 >= 0)
      measure(if (loadContaminated) 5 else 3)
      var split = splitStolen(raw, ncpus)
      // steal-poisoned reps re-run ONCE (the steal window has usually
      // moved past the query by then), then everything re-splits
      if (split.stolen > 0) { measure(split.stolen); split = splitStolen(raw, ncpus) }
      def kept = if (split.allStolen) raw.map(_._1) else split.kept
      var noisy = loadContaminated || split.allStolen
      if (!loadContaminated && dispersed(kept)) {
        measure(2); split = splitStolen(raw, ncpus)
        noisy = noisy || dispersed(kept)
      }
      var med = if (kept.isEmpty) -1.0 else medianOf(kept)
      // vs-previous-artifact outlier: re-run before recording (a clean
      // sweep re-measures; a contaminated one already ran 5 reps and
      // gates on the min — see vsPrevRegressed). Tiny queries (<50ms
      // here or <20ms before) are pure scheduler noise either way and
      // stay on the plain median path.
      val prev = prevWarm.get(name).filter(_ >= 0.02)
      var vsPrev: Option[Double] = None
      if (kept.nonEmpty && prev.exists(p =>
          vsPrevRegressed(med, kept.min, p, loadContaminated))) {
        if (!loadContaminated) {
          measure(2); split = splitStolen(raw, ncpus)
          med = if (kept.isEmpty) -1.0 else medianOf(kept)
        }
        if (kept.nonEmpty && prev.exists(p =>
            vsPrevRegressed(med, kept.min, p, loadContaminated))) {
          vsPrev = prev
          noisy = true
        }
      }
      // warm stays the honest estimator: median normally, min when the
      // sweep is load-contaminated OR every rep of this query was
      // steal-poisoned (external load/steal only adds time). A vs_prev
      // survivor KEEPS the median as warm — recording the min there
      // would ratchet the artifact toward best-case minima that the
      // next sweep's median then "regresses" against; the min rides
      // along as a separate field for the judge.
      val warm =
        if (kept.isEmpty) -1.0
        else if (loadContaminated || split.allStolen) kept.min
        else med
      QRes(name, cold, warm, noisy, vsPrev, med,
        if (kept.isEmpty) -1.0 else kept.min,
        split.stealJiffies, split.stolen, split.allStolen, shufW)
    }
    val loadEnd = loadavg()
    val stealDelta = {
      val e = stealJiffies()
      if (e >= 0 && stealStart >= 0) e - stealStart else -1L
    }
    // totals sum only successful runs; failures surface via `failed`
    val total = results.map(_.warm).filter(_ >= 0).sum
    val coldTotal = results.map(_.cold).filter(_ >= 0).sum
    val failed = results.count(r => r.cold < 0 || r.warm < 0)
    val noisyCount = results.count(_.noisy)
    val median = medianOf(results.map(_.warm).filter(_ >= 0))

    // Locale-pinned formatting: a comma-decimal default locale would
    // render 0,123 and break the JSON.
    def r3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    // Full per-query detail goes to a repo file — the driver captures only
    // the last ~2000 chars of stdout, so a 119-entry map can never fit on
    // the final line (BENCH_r03.json came back parsed:null for exactly
    // this reason). The stdout line carries totals + a headline subset.
    val detail = results.map { r =>
      "\"" + r.name + "\":{\"cold\":" + r3(r.cold) + ",\"warm\":" + r3(r.warm) +
        (if (r.noisy) ",\"noisy\":true" else "") +
        (if (loadContaminated) ",\"median\":" + r3(r.median) else "") +
        r.vsPrev.map(p => ",\"prev\":" + r3(p) + ",\"min\":" + r3(r.minRep) +
          ",\"vs_prev\":true").getOrElse("") +
        (if (r.stealJiffies > 0) ",\"steal\":" + r.stealJiffies else "") +
        (if (r.stolenReps > 0) ",\"stolen_reps\":" + r.stolenReps else "") +
        ",\"shuf_w\":" + r.shufW +
        prevShuf.get(r.name).filter(p => shufDriftedRegistered(r.name, r.shufW, p))
          .map(p => ",\"shuf_prev\":" + p + ",\"shuf_changed\":true")
          .getOrElse("") +
        prevShuf.get(r.name).filter(p => shufBimodal(r.name, r.shufW, p))
          .map(p => ",\"shuf_prev\":" + p + ",\"shuf_bimodal\":true")
          .getOrElse("") +
        (if (r.allStolen) ",\"all_stolen\":true" +
          (if (loadContaminated) "" else ",\"median\":" + r3(r.median))
         else "") +
        "}"
    }.mkString("{", ",", "}")
    // the artifact is the adjudication record — it must state the
    // estimator actually used (VERDICT r18 "What's wrong" #1): under the
    // load gate every query runs 5 warm reps and warm = min of them.
    val runLabel =
      if (loadContaminated) "\"min-of-5\"" else "\"median-of-3\""
    val contaminatedField =
      if (loadContaminated) ""","load_contaminated":true""" else ""
    val detailJson =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","run":$runLabel,"cold_total":${r3(coldTotal)},"median":${r3(median)},"n_queries":${results.size},"failed":$failed,"noisy":$noisyCount,"loadavg_start":${r3(loadStart)},"loadavg_end":${r3(loadEnd)},"steal_delta":$stealDelta$contaminatedField,"queries":$detail,"sf":"$sfDir"}"""
    // filtered profiling runs must not clobber the full-sweep detail
    if (args.isEmpty) {
      val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
      java.nio.file.Files.write(detailPath, detailJson.getBytes("UTF-8"))
      // per-stage diagnostic sidecar (round-17 item 1): every
      // (query-tag, stageId, attempt, tasks, bytes) completion event of
      // the sweep, for cross-environment byte-channel reconciliation
      meter.writeEvents(java.nio.file.Paths.get("BENCH_SHUF_EVENTS.jsonl"))
    } else {
      println(detailJson)
      // filtered profiling runs park their sidecar in /tmp (pid-scoped)
      // so targeted byte diagnostics still get per-stage events+names
      // without touching the committed full-sweep artifact
      meter.writeEvents(java.nio.file.Paths.get(
        s"/tmp/graft_shuf_events_p${ProcessHandle.current().pid()}.jsonl"))
    }

    // db-benchmark-shaped headline subset: core aggs/joins/windows/reshape
    // plus the LLM-pipeline flagships. Kept well under the tail budget.
    val headline = Seq(
      "q1_agg", "q_gforce", "q_keyby", "q_topk", "q_distinct",
      "q_join_inner", "q_join_left", "q_asof", "q_overlap", "q_mult_first",
      "q_sort_limit", "q_melt", "q_dcast", "q_froll_mean", "q_rank",
      "q_shift", "q_update_by", "q_pipeline", "q_dedup_exact",
      "q_dedup_minhash", "q_dedup_prune", "q_embed_topk", "q_ann_ivf",
      "q_ann_ivf_sampled", "q_cosine_pairs", "q_langid", "q_token_count",
      "q_sample_hash", "q_token_pack", "q_doc_chunks", "q_quantiles",
      "q_asof_salted", "q_quantiles_approx",
      "q_curation_pipeline", "q_contamination", "q_quality_filter",
      "q_domain_cap", "q_ann_pq")
    val warmByName = results.map(r => r.name -> r.warm).toMap
    val qs = headline.flatMap(k => warmByName.get(k).map(w => "\"" + k + "\":" + r3(w)))
      .mkString("{", ",", "}")
    val summaryLine = s"""{"metric":"total","value":${r3(total)},"unit":"sec","run":$runLabel,"cold_total":${r3(coldTotal)},"median":${r3(median)},"n_queries":${results.size},"failed":$failed,"noisy":$noisyCount,"loadavg_start":${r3(loadStart)},"loadavg_end":${r3(loadEnd)},"steal_delta":$stealDelta$contaminatedField,"detail":"BENCH_DETAIL.json","queries":$qs,"sf":"$sfDir"}"""
    println(summaryLine)
    // ALSO write the identical one-line JSON to a bare file: the bench's
    // stdout reaches the driver through sbt, which has prefixed every
    // line with "[info] " since round 1 — the driver's parser never
    // parsed a single sweep (BENCH_r17-r21 all carry parsed:null), so no
    // automated round-over-round comparison has ever run. A prefix-free
    // file is the robust channel (VERDICT r21 "What's wrong" #1).
    // Additions-only: the stdout line, the timing methodology and
    // BENCH_DETAIL.json are byte-for-byte what they were.
    if (args.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SUMMARY.json"),
        (summaryLine + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
