package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IndexCommit

/** Round-20 hardening (ADVICE r19 ×5 + VERDICT r19 "Next round" #2/#4):
  * publish() is a true create-exclusive (the local-fs rename-replaces
  * TOCTOU is closed with link(2)); batch keys cover the stored PAYLOAD,
  * not just the lossy bucket projection; prependBytes survives
  * concurrent duplicate attempts (speculation); dcastMulti fills apply
  * positionally under referenceNames=false; the empty-input
  * rollup/cube grand-total repair is IN-PLAN (no job at DSL-build
  * time); and IndexCommit gains a crash-safe compact() that folds
  * nightly-append batch dirs back into one base per component.
  */
class Round20Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = spark.read
    .parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    .withColumn("embedding", transform(col("embedding"), _.cast("double")))

  private def freshIdx(tag: String): String = {
    val p = TestTmp.path(tag)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  // ---- publish: create-exclusive under real concurrency ---------------

  test("publish: N concurrent racers on one version — exactly one wins, its chain survives") {
    val root = freshIdx("graft_r20_pub_race")
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        // every racer passes its own exists() fast path near-simultaneously;
        // only the atomic create may decide the winner
        if (IndexCommit.publish(spark, root, 1, None, Seq(s"k$i")))
          { wins.add(i); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.size == 1, s"exactly one publish(v1) must win, got $wins")
    val st = IndexCommit.read(spark, root)
    assert(st.version == 1 && st.batches == Seq(s"k${wins.peek()}"),
      s"the surviving manifest must be the winner's: $st vs winner ${wins.peek()}")
  }

  test("publish/read round-trips the base= redirect line") {
    val root = freshIdx("graft_r20_pub_base")
    assert(IndexCommit.publish(spark, root, 1, Some("counts_v1_x"),
      Seq("ka", "kb")))
    assert(IndexCommit.publish(spark, root, 2, Some("counts_v1_x"), Nil,
      Some("base_v2")))
    val st = IndexCommit.read(spark, root)
    assert(st == IndexCommit.State(2, Some("counts_v1_x"), Nil,
      Some("base_v2")))
    assert(IndexCommit.componentPaths(root, "sigs", st) ==
      Seq(s"$root/base_v2/sigs"))
  }

  // ---- batch keys cover the payload (ADVICE r19 #2) --------------------

  test("batchKey: same bucket keys with an updated payload is a DIFFERENT batch") {
    import spark.implicits._
    val a = Seq((1L, 3, Seq(0.1, 0.2))).toDF("id", "sig", "vec")
    val b = Seq((1L, 3, Seq(0.1, 0.9))).toDF("id", "sig", "vec")
    assert(IndexCommit.batchKey(a, Seq("id", "sig", "vec")) !=
      IndexCommit.batchKey(b, Seq("id", "sig", "vec")))
    // and the projection the r19 code hashed really was lossy
    assert(IndexCommit.batchKey(a, Seq("id", "sig")) ==
      IndexCommit.batchKey(b, Seq("id", "sig")))
  }

  test("cell append: same ids with UPDATED vectors commits as a new batch") {
    val e = emb
    val idx = freshIdx("graft_r20_cell_payload")
    val cents = (0 until 4).map(c =>
      (0 until 64).map(d => (((c * 131 + d * 31) % 2000) - 1000) / 1000.0))
    graft.sim.Similarity.saveCellIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cents, idx)
    val day1 = e.filter(col("vec_id") % 2 === 1).limit(20)
    graft.sim.Similarity.appendToCellIndex(spark, idx, day1,
      "vec_id", "embedding")
    val n1 = graft.sim.Similarity.cellIndexCells(spark, idx).count()
    // same ids, same cells (vectors scaled by a positive constant keep
    // their argmax-cosine centroid), new payload → must NOT be dropped
    val updated = day1.withColumn("embedding",
      transform(col("embedding"), _ * 0.5))
    graft.sim.Similarity.appendToCellIndex(spark, idx, updated,
      "vec_id", "embedding")
    val st = IndexCommit.read(spark, idx)
    assert(st.batches.size == 2,
      s"updated-payload batch was swallowed as an idempotent retry: $st")
    assert(graft.sim.Similarity.cellIndexCells(spark, idx).count() ==
      n1 + 20)
  }

  test("band append: same ids with changed TEXT commits as a new batch") {
    import spark.implicits._
    val base = Seq((1L, "completely original corpus text right here"))
      .toDF("doc_id", "text")
    val idx = freshIdx("graft_r20_band_payload")
    graft.dedup.Dedup.saveBandIndex(base, "doc_id", "text", idx)
    val day1 = Seq((2L, "first version of the day one document text"))
      .toDF("doc_id", "text")
    graft.dedup.Dedup.appendToBandIndex(day1, "doc_id", "text", idx)
    val day1b = Seq((2L, "second revision of the day one document text"))
      .toDF("doc_id", "text")
    graft.dedup.Dedup.appendToBandIndex(day1b, "doc_id", "text", idx)
    assert(IndexCommit.read(spark, idx).batches.size == 2)
    assert(graft.dedup.Dedup.bandIndexShingles(spark, idx).count() == 3)
  }

  // ---- compact() (VERDICT r19 "What's missing" #2) ---------------------

  test("band compact: results identical, reader paths drop to one dir per component, appends continue") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark and scala engines"))
      .toDF("doc_id", "text")
    val idx = freshIdx("graft_r20_band_compact")
    graft.dedup.Dedup.saveBandIndex(base, "doc_id", "text", idx)
    graft.dedup.Dedup.appendToBandIndex(
      Seq((3L, "the quick brown fox jumps over the lazy dog again and again"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    graft.dedup.Dedup.appendToBandIndex(
      Seq((4L, "novel content that matches nothing else in the index"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    val stPre = IndexCommit.read(spark, idx)
    assert(IndexCommit.componentPaths(idx, "shingles", stPre).size == 3)
    def snap() = (
      graft.dedup.Dedup.bandIndexShingles(spark, idx)
        .select(col("id"), xxhash64(col("sh")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq,
      graft.dedup.Dedup.bandIndexBanded(spark, idx)
        .collect().map(_.toString).sorted.toSeq)
    val before = snap()

    // crash mid-compaction: a staged-but-unpublished base dir is inert
    val junk = new java.io.File(s"$idx/base_v${stPre.version + 1}/shingles")
    junk.mkdirs()
    assert(IndexCommit.read(spark, idx) == stPre)
    assert(snap() == before, "staged dir leaked into the committed view")

    assert(graft.dedup.Dedup.compactBandIndex(spark, idx) == 2)
    val stPost = IndexCommit.read(spark, idx)
    assert(stPost.batches.isEmpty && stPost.base.isDefined)
    assert(IndexCommit.componentPaths(idx, "shingles", stPost).size == 1)
    assert(snap() == before, "compaction changed the committed view")
    // gc: the folded batch dirs and the legacy base are gone
    assert(!new java.io.File(s"$idx/batches").exists() ||
      new java.io.File(s"$idx/batches").list().isEmpty)
    assert(!new java.io.File(s"$idx/shingles").exists())
    // idempotent: nothing left to fold
    assert(graft.dedup.Dedup.compactBandIndex(spark, idx) == 0)
    // appends keep working on the compacted index
    graft.dedup.Dedup.appendToBandIndex(
      Seq((5L, "post compaction day three batch")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val st3 = IndexCommit.read(spark, idx)
    assert(st3.batches.size == 1 && st3.base == stPost.base)
    assert(graft.dedup.Dedup.bandIndexShingles(spark, idx).count() == 5)
  }

  test("lsh compact: indexed search identical before/after; counts agg rides along") {
    val e = emb
    val idx = freshIdx("graft_r20_lsh_compact")
    graft.sim.Similarity.saveLshIndex(e.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", idx, dim = 64, nBits = 4)
    graft.sim.Similarity.appendToLshIndex(spark, idx,
      e.filter(col("vec_id") % 3 === 1), "vec_id", "embedding",
      dim = 64, nBits = 4)
    graft.sim.Similarity.appendToLshIndex(spark, idx,
      e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding",
      dim = 64, nBits = 4)
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    def search() = graft.sim.Similarity.lshTopKIndexed(spark, idx, queries,
      "vec_id", "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    val before = search()
    assert(graft.sim.Similarity.compactLshIndex(spark, idx) == 2)
    assert(search() == before, "compaction changed search results")
    val st = IndexCommit.read(spark, s"$idx/lsh")
    assert(st.batches.isEmpty && st.base.isDefined && st.aggDir.isDefined)
  }

  test("cell compact: committed view identical before/after") {
    val e = emb
    val idx = freshIdx("graft_r20_cell_compact")
    val cents = (0 until 4).map(c =>
      (0 until 64).map(d => (((c * 131 + d * 31) % 2000) - 1000) / 1000.0))
    graft.sim.Similarity.saveCellIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cents, idx)
    graft.sim.Similarity.appendToCellIndex(spark, idx,
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
    def snap() = graft.sim.Similarity.cellIndexCells(spark, idx)
      .select(col("id"), col("cell"), xxhash64(col("vec").cast("string")))
      .collect().map(_.toString).sorted.toSeq
    val before = snap()
    assert(graft.sim.Similarity.compactCellIndex(spark, idx) == 1)
    assert(snap() == before)
  }

  test("compact bounds reader listing cost: 12 nightly appends → 13 dirs → 1 dir") {
    import spark.implicits._
    val idx = freshIdx("graft_r20_compact_cost")
    graft.dedup.Dedup.saveBandIndex(
      Seq((0L, "base corpus document text for the listing probe"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    (1 to 12).foreach { d =>
      graft.dedup.Dedup.appendToBandIndex(
        Seq((d.toLong, s"unique day $d document body with its own words $d"))
          .toDF("doc_id", "text"), "doc_id", "text", idx)
    }
    val stPre = IndexCommit.read(spark, idx)
    assert(stPre.batches.size == 12)
    def listCount(st: IndexCommit.State): Int =
      IndexCommit.componentPaths(idx, "shingles", st).size +
        IndexCommit.componentPaths(idx, "banded", st).size
    val t0 = System.nanoTime()
    val nPre = graft.dedup.Dedup.bandIndexShingles(spark, idx).count()
    val msPre = (System.nanoTime() - t0) / 1e6
    assert(listCount(stPre) == 26) // 13 dirs per component
    assert(graft.dedup.Dedup.compactBandIndex(spark, idx) == 12)
    val stPost = IndexCommit.read(spark, idx)
    assert(listCount(stPost) == 2) // 1 dir per component
    val t1 = System.nanoTime()
    val nPost = graft.dedup.Dedup.bandIndexShingles(spark, idx).count()
    val msPost = (System.nanoTime() - t1) / 1e6
    assert(nPre == nPost && nPost == 13L)
    // advisory probe row (wall-clock on local fs is noisy; the path
    // count is the load-bearing assertion — listing cost ∝ dir count)
    info(f"compact probe: shingle read 13-dir $msPre%.0f ms -> 1-dir $msPost%.0f ms")
  }

  // ---- prependBytes under concurrent duplicate attempts ----------------

  test("prependBytes: stale attempt-unique tmps are harmless and swept") {
    val dir = TestTmp.path("graft_r20_bom_spec")
    new java.io.File(dir).mkdirs()
    val data = "a,1\nb,2\n".getBytes("UTF-8")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.csv"), data)
    // a speculative attempt died after writing its half-copy
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_part-00000.csv.bom.0-42"),
      "GARBAGE".getBytes("UTF-8"))
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val out = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.csv"))
    assert(out.take(3).toSeq == bom.toSeq && out.drop(3).toSeq == data.toSeq)
    val litter = new java.io.File(dir).list().filter(n =>
      n.endsWith(".orig") || n.contains(".bom"))
    assert(litter.isEmpty, litter.toSeq.toString)
  }

  test("prependBytes: losing rename(part -> orig) to a live concurrent attempt is a skip, not a failure") {
    // simulate the winner's state: orig present AND part already
    // reinstalled by the other attempt — this attempt must no-op
    val dir = TestTmp.path("graft_r20_bom_winner")
    new java.io.File(dir).mkdirs()
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val data = "a,1\n".getBytes("UTF-8")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.csv"), bom ++ data)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_part-00000.csv.orig"), data)
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val out = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.csv"))
    assert(out.toSeq == (bom ++ data).toSeq, "double-prepended")
    assert(new java.io.File(dir).list().forall(n => !n.endsWith(".orig")))
  }

  // ---- dcastMulti fills under referenceNames=false (ADVICE r19 #5) -----

  test("dcastMulti: fills apply positionally regardless of naming convention") {
    import spark.implicits._
    val df = Seq(("r1", "a", 1.0), ("r1", "a", 3.0), ("r2", "b", 5.0))
      .toDF("k", "p", "v")
    for (refNames <- Seq(true, false)) {
      val wide = graft.operators.Reshape.dcastMulti(df, Seq("k"), "p",
        Seq("a", "b"),
        Seq("v_sum" -> sum(col("v")), "v_mean" -> avg(col("v"))),
        referenceNames = refNames,
        fills = Map("v_sum" -> lit(0.0), "v_mean" -> lit(Double.NaN)))
      val rows = wide.orderBy("k").collect()
      // r1 has no 'b' cells: sum fills 0.0, mean fills NaN — in BOTH
      // naming conventions (the r19 name-keyed map silently ignored
      // fills under referenceNames=false)
      val r1 = rows(0)
      assert(r1.getDouble(r1.fieldIndex(
        if (refNames) "v_sum_b" else "b_v_sum")) == 0.0,
        s"refNames=$refNames: sum fill ignored")
      assert(r1.getDouble(r1.fieldIndex(
        if (refNames) "v_mean_b" else "b_v_mean")).isNaN,
        s"refNames=$refNames: mean fill ignored")
      // observed cells untouched
      assert(r1.getDouble(r1.fieldIndex(
        if (refNames) "v_sum_a" else "a_v_sum")) == 4.0)
    }
  }

  // ---- lazy empty-input rollup repair (VERDICT r19 #2 / ADVICE #4) -----

  test("groupingSetsAgg: DSL build runs ZERO Spark jobs (the repair is in-plan)") {
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(
        spark.sparkContext, 10000L)
      jobs.set(0)
      val df = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
        .filter(col("v") > 100.0) // empty at execution time
      val dt = DT(df).rollupAgg(Seq("g" -> col("g")),
        Seq(sum(col("v")).as("s")))
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(
        spark.sparkContext, 10000L)
      assert(jobs.get() == 0,
        s"rollupAgg construction ran ${jobs.get()} Spark job(s) — the " +
          "empty-input repair must live inside the lazy plan")
      // and the plan still repairs the () row at EXECUTION time
      val rows = dt.df.collect()
      assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).isNullAt(1),
        s"empty-input rollup must emit one () grand-total row: ${rows.toSeq}")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("groupingSetsAgg: non-empty input emits exactly one () row (no fabricated duplicate)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("g", "v")
    val out = DT(df).cubeAgg(Seq("g" -> col("g")),
      Seq(sum(col("v")).as("s"))).df.collect()
    val totals = out.filter(_.isNullAt(0))
    assert(totals.length == 1 && totals(0).getDouble(1) == 7.0)
    assert(out.length == 3)
  }

  test("groupingSetsAgg: repair binds to EXECUTION-time data, not build-time (lazy semantics)") {
    import spark.implicits._
    // the same physical plan executed twice must produce the () row
    // both times — under the r19 eager probe the plan SHAPE depended on
    // the data observed at construction; here both shapes are one plan
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    val dt = DT(empty).rollupAgg(Seq("g" -> col("g")),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
    val r1 = dt.df.collect()
    val r2 = dt.df.collect()
    assert(r1.toSeq == r2.toSeq && r1.length == 1)
    assert(r1(0).isNullAt(0) && r1(0).getLong(1) == 0L && r1(0).isNullAt(2))
  }
}
