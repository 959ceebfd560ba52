package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 hardening: persisted-LSH search tier, the bimodal shuffle
  * registry, sidecar escaping, runtime /tmp hygiene, prependBytes
  * idempotency, and plan-shape locks for the §2.3 flagship joins whose
  * corpus-decade byte behavior the new ScaleProbe entries
  * (asof_probe / asof_salted_probe / overlap_probe /
  * ann_lsh_persisted_probe) measure.
  */
class Round18Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ---- known-bimodal shuffle registry (VERDICT r17 item 3) -----------

  test("bimodal registry: the two pinned q_curation_pipeline volumes annotate, any third value flags") {
    val (a, b) = (941626L, 1618684L)
    // the documented flip, both directions: suppressed + annotated
    assert(!Bench.shufDriftedRegistered("q_curation_pipeline", a, b))
    assert(!Bench.shufDriftedRegistered("q_curation_pipeline", b, a))
    assert(Bench.shufBimodal("q_curation_pipeline", a, b))
    assert(Bench.shufBimodal("q_curation_pipeline", b, a))
    // identical values: no annotation noise
    assert(!Bench.shufBimodal("q_curation_pipeline", a, a))
    // a THIRD value still fires, in either position
    assert(Bench.shufDriftedRegistered("q_curation_pipeline", 2718281L, a))
    assert(Bench.shufDriftedRegistered("q_curation_pipeline", b, 2718281L))
    assert(!Bench.shufBimodal("q_curation_pipeline", 2718281L, a))
    // the registry is per-query: the same pair under another name flags
    assert(Bench.shufDriftedRegistered("q_other", a, b))
    assert(!Bench.shufBimodal("q_other", a, b))
  }

  // ---- sidecar stage-name escaping (ADVICE r17) ----------------------

  test("escapeStageName neutralizes control chars and emits a valid JSON string") {
    val nasty = "runJob at Foo.scala:12\twith\r\"quotes\"\\and\nnewlines" +
      "\u0001ctl"
    val esc = Bench.escapeStageName(nasty)
    // no raw control bytes survive
    assert(!esc.exists(_ < ' '), esc)
    // the embedded fragment must parse as JSON
    val json = s"""{"name":"$esc"}"""
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("name").asText().contains("quotes"))
    // truncation happens BEFORE escaping: a backslash at the cut point
    // cannot split its escape pair
    val edge = ("x" * 89) + "\\tail"
    val escEdge = Bench.escapeStageName(edge)
    assert(escEdge.endsWith("\\\\"), escEdge)
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s"""{"name":"$escEdge"}""")
    assert(parsed.get("name").asText().endsWith("\\"))
  }

  // ---- runtime /tmp hygiene (VERDICT r17 item 4) ---------------------

  test("RuntimeTmp.perPid registers this process's dir and sweeps dead predecessors") {
    val prefix = "graft_r18spec_rt"
    // plant a leftover from a "dead" pid (pid 1 is init — alive — so use
    // an impossible pid; Linux pid_max caps near 4 million)
    val dead = new java.io.File(s"/tmp/${prefix}_p99999999")
    dead.mkdirs()
    new java.io.File(dead, "leftover.csv").createNewFile()
    // and one from a LIVE pid (our own) that must survive the sweep
    val live = new java.io.File(
      s"/tmp/${prefix}_p${ProcessHandle.current().pid()}")
    live.mkdirs()
    try {
      val got = RuntimeTmp.perPid(prefix)
      assert(got == live.getPath, got)
      assert(!dead.exists(), "dead-pid leftover not swept")
      assert(live.exists(), "live-pid dir must not be touched")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dead)
      org.apache.commons.io.FileUtils.deleteQuietly(live)
    }
  }

  // ---- prependBytes idempotency (ADVICE r17) -------------------------

  test("prependBytes is idempotent: a re-executed task never double-prepends the BOM") {
    import spark.implicits._
    val dir = TestTmp.path("graft_r18_bom_idem")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    graft.sources.Fread.fwrite(
      Seq((1, "a"), (2, "b")).toDF("i", "s").coalesce(1), dir,
      graft.sources.Fread.FwriteOptions(bom = true))
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    // simulate a speculative/retried post-pass task: run the pass again
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    assert(bytes.take(3).toSeq == bom.toSeq, "BOM missing")
    assert(bytes.slice(3, 6).toSeq != bom.toSeq, "BOM duplicated by retry")
    // no temp droppings either
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".bom")))
  }

  // ---- persisted LSH tier: identity with the no-index path -----------

  test("lshTopKIndexed through a saved index returns exactly lshTopK's results") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    val idx = TestTmp.path("graft_r18_lshidx")
    graft.sim.Similarity.saveLshIndex(e, "vec_id", "embedding", idx,
      dim = 64, nBits = 4)
    val direct = graft.sim.Similarity.lshTopK(e, queries, "vec_id",
      "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    val indexed = graft.sim.Similarity.lshTopKIndexed(spark, idx, queries,
      "vec_id", "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(indexed.nonEmpty)
    assert(indexed == direct)
  }

  test("appendToLshIndex stitches a batch into the index: search == full-corpus lshTopK") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    val idx = TestTmp.path("graft_r18_lshidx_incr")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    graft.sim.Similarity.saveLshIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx, dim = 64, nBits = 4)
    graft.sim.Similarity.appendToLshIndex(spark, idx,
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      dim = 64, nBits = 4)
    val direct = graft.sim.Similarity.lshTopK(e, queries, "vec_id",
      "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    val stitched = graft.sim.Similarity.lshTopKIndexed(spark, idx, queries,
      "vec_id", "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(stitched.nonEmpty)
    assert(stitched == direct)
    // the merged counts table equals a from-scratch count of the
    // stitched sigs (one row per sig, summed populations)
    val counts = graft.sim.Similarity.lshIndexCounts(spark, idx)
    val recount = graft.sim.Similarity.lshIndexSigs(spark, idx)
      .groupBy(col("sig")).agg(count(lit(1)).as("n"))
    assert(counts.count() == recount.count())
    assert(counts.join(recount, Seq("sig", "n"), "left_anti").count() == 0,
      "merged counts diverge from a recount of the stitched sigs")
  }

  test("broadcastQueries=false escape hatches return identical results (planner-chosen join)") {
    val e = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    val cents = (0 until 4).map(c =>
      (0 until 64).map(d => (((c * 131 + d * 31) % 2000) - 1000) / 1000.0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rk").collect().toSeq
    assert(rows(graft.sim.Similarity.lshTopK(e, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5, broadcastQueries = false)) ==
      rows(graft.sim.Similarity.lshTopK(e, queries, "vec_id", "embedding",
        dim = 64, nBits = 4, k = 5)))
    assert(rows(graft.sim.Similarity.lshTopKWithFallback(e, queries, "vec_id",
        "embedding", dim = 64, nBits = 4, k = 5, maxBucket = 50,
        broadcastQueries = false)) ==
      rows(graft.sim.Similarity.lshTopKWithFallback(e, queries, "vec_id",
        "embedding", dim = 64, nBits = 4, k = 5, maxBucket = 50)))
    assert(rows(graft.sim.Similarity.ivfTopK(e, queries, "vec_id", "embedding",
        cents, k = 5, nprobe = 2, broadcastQueries = false)) ==
      rows(graft.sim.Similarity.ivfTopK(e, queries, "vec_id", "embedding",
        cents, k = 5, nprobe = 2)))
  }

  test("overlap broadcastY pins the bounded interval side even when it is a derived aggregate") {
    import spark.implicits._
    val x = (1 to 500).map(i => (i.toLong, i.toDouble, i + 5.0))
      .toDF("xid", "xs", "xe")
    // DERIVED bounded side: an aggregate carries an unknown planner
    // estimate — the semIncremental hazard class the flag exists for
    val y = (1 to 50).flatMap(i => Seq((i.toLong, i * 7.0, i * 7.0 + 3.0),
        (i.toLong, i * 7.0, i * 7.0 + 3.0)))
      .toDF("yid", "ys0", "ye0")
      .groupBy("yid").agg(min(col("ys0")).as("ps"), max(col("ye0")).as("pe"))
    val hinted = graft.operators.Joins.overlapBinned(x, y, Nil,
      "xs", "xe", "ps", "pe", binWidth = 8L, broadcastY = true)
    val plain = graft.operators.Joins.overlapBinned(x, y, Nil,
      "xs", "xe", "ps", "pe", binWidth = 8L)
    val p = hinted.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"broadcastY=true must pin a broadcast join:\n$p")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("xid", "yid").collect().toSeq
    assert(rows(hinted).nonEmpty)
    assert(rows(hinted) == rows(plain))
    // the keyed (non-binned) route honors the flag too
    val keyed = graft.operators.Joins.overlap(
      x.withColumn("k", col("xid") % 3),
      y.withColumn("k", col("yid") % 3), Seq("k"),
      "xs", "xe", "ps", "pe", broadcastY = true)
    assert(keyed.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  // ---- plan-shape locks for the probe-proven contracts ---------------
  // The corpus-decade byte probes (ScaleProbe r18) prove these shapes;
  // the locks pin them so a revert fails fast at test time, the same
  // discipline as Round17Spec's search-join locks.

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString

  /** Non-broadcast shuffle Exchanges in a plan string ("Exchange" as a
    * standalone token; "BroadcastExchange" does not match).
    */
  private def shuffleExchanges(p: String): Int =
    "(?<![A-Za-z])Exchange".r.findAllIn(p).size

  test("q_asof: ONE data shuffle (the tagged-union window), nothing quadratic") {
    val p = plan("q_asof")
    assert(shuffleExchanges(p) == 1, s"asof must shuffle the data exactly once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q_asof_salted / q_overlap: no quadratic join shapes") {
    for (q <- Seq("q_asof_salted", "q_overlap")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q grew a quadratic join:\n$p")
    }
  }

  test("q_ann_lsh_persisted / q_ann_lsh_incr: broadcast candidate join + WindowGroupLimit, ONE shuffle total") {
    for (q <- Seq("q_ann_lsh_persisted", "q_ann_lsh_incr")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: corpus-side sort-merge crept in:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
      // the rank's partial top-k must stay below the exchange — that is
      // what makes the per-search shuffle corpus-size-independent
      assert(p.contains("WindowGroupLimit"), p)
      assert(shuffleExchanges(p) == 1,
        s"$q: persisted LSH search must shuffle only the rank partials:\n$p")
    }
  }
}
