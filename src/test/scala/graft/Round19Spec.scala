package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IndexCommit

/** Round-19 hardening: the crash-safe, retry-idempotent index-append
  * protocol (VERDICT r18 "What's missing" #2 / "Next round" #2;
  * ADVICE r18 #2). Every test here attacks a failure point the
  * round-18 appends were vulnerable to: a crash between the two
  * component writes, a caller-level retry double-appending the batch,
  * and a publish race between concurrent appenders.
  */
class Round19Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb = spark.read
    .parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    .withColumn("embedding", transform(col("embedding"), _.cast("double")))

  private def freshIdx(tag: String): String = {
    val p = TestTmp.path(tag)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  // ---- IndexCommit primitives ----------------------------------------

  test("IndexCommit: legacy root (no manifest) reads as version 0 with no batches") {
    val root = freshIdx("graft_r19_ic_legacy")
    assert(IndexCommit.read(spark, root) == IndexCommit.State(0, None, Nil))
    new java.io.File(root).mkdirs()
    assert(IndexCommit.read(spark, root) == IndexCommit.State(0, None, Nil))
  }

  test("IndexCommit: publish is create-once — the losing racer gets false and retries against the new state") {
    val root = freshIdx("graft_r19_ic_race")
    assert(IndexCommit.publish(spark, root, 1, None, Seq("k1")))
    // same version again: the slot is taken, rename-create refuses
    assert(!IndexCommit.publish(spark, root, 1, None, Seq("k2")))
    // the committed manifest is intact, not clobbered by the loser
    assert(IndexCommit.read(spark, root) ==
      IndexCommit.State(1, None, Seq("k1")))
    // the loser re-reads and lands on the next version
    assert(IndexCommit.publish(spark, root, 2, Some("counts_v2_k2"),
      Seq("k1", "k2")))
    assert(IndexCommit.read(spark, root) ==
      IndexCommit.State(2, Some("counts_v2_k2"), Seq("k1", "k2")))
  }

  test("IndexCommit.batchKey is content-derived: order/partitioning-invariant, content-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val shuffled = a.orderBy(col("id").desc).repartition(7)
    assert(IndexCommit.batchKey(a, Seq("id", "v")) ==
      IndexCommit.batchKey(shuffled, Seq("id", "v")))
    val b = Seq((1L, "x"), (2L, "y"), (3L, "DIFFERENT")).toDF("id", "v")
    assert(IndexCommit.batchKey(a, Seq("id", "v")) !=
      IndexCommit.batchKey(b, Seq("id", "v")))
  }

  // ---- LSH append: crash between the two writes ----------------------

  test("LSH append crash before publish: search sees the OLD index; the retry repairs and commits exactly once") {
    val e = emb
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    val idx = freshIdx("graft_r19_lsh_crash")
    val root = s"$idx/lsh"
    Similarity19.save(e.filter(col("vec_id") % 2 === 0), idx)
    val before = Similarity19.search(spark, idx, queries)

    // Simulate the r18 failure point — batch data staged, counts
    // written, but the process dies BEFORE the manifest publish: stage
    // exactly what appendToLshIndex stages, then "crash" (skip publish).
    val half = e.filter(col("vec_id") % 2 === 1)
    val key = stageLshPartial(idx, half)

    // a reader AFTER the crash: identical to the pre-append search —
    // the staged dirs and orphan counts are unreferenced garbage
    val after = Similarity19.search(spark, idx, queries)
    assert(after == before, "a torn append changed search results")
    // counts still audit-clean against sigs at the committed state
    val counts = graft.sim.Similarity.lshIndexCounts(spark, idx)
    val recount = graft.sim.Similarity.lshIndexSigs(spark, idx)
      .groupBy(col("sig")).agg(count(lit(1)).as("n"))
    assert(counts.join(recount, Seq("sig", "n"), "left_anti").count() == 0)

    // the caller RETRIES the whole append: must commit exactly once
    graft.sim.Similarity.appendToLshIndex(spark, idx, half,
      "vec_id", "embedding", dim = 64, nBits = 4)
    val st = IndexCommit.read(spark, root)
    assert(st.version == 1 && st.batches == Seq(key),
      s"retry did not commit exactly once: $st")
    // stitched search == full-corpus search, counts == recount
    val direct = graft.sim.Similarity.lshTopK(e, queries, "vec_id",
      "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(Similarity19.search(spark, idx, queries) == direct)
    val counts2 = graft.sim.Similarity.lshIndexCounts(spark, idx)
    val recount2 = graft.sim.Similarity.lshIndexSigs(spark, idx)
      .groupBy(col("sig")).agg(count(lit(1)).as("n"))
    assert(counts2.count() == recount2.count())
    assert(counts2.join(recount2, Seq("sig", "n"), "left_anti").count() == 0)
  }

  /** Reproduce appendToLshIndex's staging writes for a batch WITHOUT
    * the manifest publish — the "crashed mid-append" disk state.
    * Returns the batch key. */
  private def stageLshPartial(idx: String,
                              batch: org.apache.spark.sql.DataFrame): String = {
    val root = s"$idx/lsh"
    // sign exactly as the real append does: run the real append against
    // a scratch copy of the index, then transplant its staged artifacts
    // minus the manifest
    val scratch = freshIdx("graft_r19_lsh_scratch")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(idx), new java.io.File(scratch))
    graft.sim.Similarity.appendToLshIndex(spark, scratch, batch,
      "vec_id", "embedding", dim = 64, nBits = 4)
    val st = IndexCommit.read(spark, s"$scratch/lsh")
    assert(st.version == 1 && st.batches.size == 1)
    val key = st.batches.head
    // transplant staged batch dir + versioned counts, NOT the manifest
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$scratch/lsh/batches"),
      new java.io.File(s"$root/batches"))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$scratch/lsh/${st.aggDir.get}"),
      new java.io.File(s"$root/${st.aggDir.get}"))
    key
  }

  test("LSH append retry of an ALREADY-committed batch is a no-op: no double-append, no double-count") {
    val e = emb
    val idx = freshIdx("graft_r19_lsh_idem")
    Similarity19.save(e.filter(col("vec_id") % 2 === 0), idx)
    val batch = e.filter(col("vec_id") % 2 === 1)
    graft.sim.Similarity.appendToLshIndex(spark, idx, batch,
      "vec_id", "embedding", dim = 64, nBits = 4)
    val st1 = IndexCommit.read(spark, s"$idx/lsh")
    val sigs1 = graft.sim.Similarity.lshIndexSigs(spark, idx).count()
    val n1 = graft.sim.Similarity.lshIndexCounts(spark, idx)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    // the retry (same content, different row order) must change NOTHING
    graft.sim.Similarity.appendToLshIndex(spark, idx,
      batch.orderBy(col("vec_id").desc).repartition(5),
      "vec_id", "embedding", dim = 64, nBits = 4)
    assert(IndexCommit.read(spark, s"$idx/lsh") == st1)
    assert(graft.sim.Similarity.lshIndexSigs(spark, idx).count() == sigs1)
    assert(graft.sim.Similarity.lshIndexCounts(spark, idx)
      .agg(sum(col("n"))).collect()(0).getLong(0) == n1)
  }

  // ---- band index: torn two-component append is impossible -----------

  test("band append: components publish atomically; a same-batch retry is a no-op") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark and scala engines"))
      .toDF("doc_id", "text")
    val day1 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "novel content that matches nothing else in the index at all"))
      .toDF("doc_id", "text")
    val idx = freshIdx("graft_r19_band_idem")
    graft.dedup.Dedup.saveBandIndex(base, "doc_id", "text", idx)
    graft.dedup.Dedup.appendToBandIndex(day1, "doc_id", "text", idx)
    val st1 = IndexCommit.read(spark, idx)
    assert(st1.version == 1 && st1.batches.size == 1)
    val sh1 = graft.dedup.Dedup.bandIndexShingles(spark, idx).count()
    val bd1 = graft.dedup.Dedup.bandIndexBanded(spark, idx).count()
    // shingles and banded commit TOGETHER: both reflect day1
    assert(sh1 == 4 && bd1 > 0)
    // retry the same batch: zero growth
    graft.dedup.Dedup.appendToBandIndex(day1.repartition(3), "doc_id",
      "text", idx)
    assert(IndexCommit.read(spark, idx) == st1)
    assert(graft.dedup.Dedup.bandIndexShingles(spark, idx).count() == sh1)
    assert(graft.dedup.Dedup.bandIndexBanded(spark, idx).count() == bd1)
    // a DIFFERENT batch still appends
    val day2 = Seq((5L, "yet more unique text for the second day batch"))
      .toDF("doc_id", "text")
    graft.dedup.Dedup.appendToBandIndex(day2, "doc_id", "text", idx)
    val st2 = IndexCommit.read(spark, idx)
    assert(st2.version == 2 && st2.batches.size == 2)
    assert(graft.dedup.Dedup.bandIndexShingles(spark, idx).count() == 5)
  }

  test("cell append: same-batch retry is a no-op; search result unchanged by the retry") {
    val e = emb
    val idx = freshIdx("graft_r19_cell_idem")
    val cents = (0 until 4).map(c =>
      (0 until 64).map(d => (((c * 131 + d * 31) % 2000) - 1000) / 1000.0))
    graft.sim.Similarity.saveCellIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cents, idx)
    val day1 = e.filter(col("vec_id") % 2 === 1)
    graft.sim.Similarity.appendToCellIndex(spark, idx, day1,
      "vec_id", "embedding")
    val n1 = graft.sim.Similarity.cellIndexCells(spark, idx).count()
    val st1 = IndexCommit.read(spark, idx)
    graft.sim.Similarity.appendToCellIndex(spark, idx,
      day1.repartition(4), "vec_id", "embedding")
    assert(graft.sim.Similarity.cellIndexCells(spark, idx).count() == n1)
    assert(IndexCommit.read(spark, idx) == st1)
  }

  test("saveLshIndex over an appended index RESETS the commit state (no stale-manifest mix)") {
    val e = emb
    val idx = freshIdx("graft_r19_lsh_reset")
    Similarity19.save(e.filter(col("vec_id") % 2 === 0), idx)
    graft.sim.Similarity.appendToLshIndex(spark, idx,
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      dim = 64, nBits = 4)
    assert(IndexCommit.read(spark, s"$idx/lsh").version == 1)
    // full rebuild over the whole corpus: back to legacy v0, and the
    // old batch dirs/manifests cannot shadow the new base
    Similarity19.save(e, idx)
    assert(IndexCommit.read(spark, s"$idx/lsh") ==
      IndexCommit.State(0, None, Nil))
    val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
    val direct = graft.sim.Similarity.lshTopK(e, queries, "vec_id",
      "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(Similarity19.search(spark, idx, queries) == direct)
  }
  // ---- prependBytes rename-state idempotence (ADVICE r18 #3) ----------

  test("prependBytes stamps the BOM even when the data itself begins with U+FEFF bytes") {
    // the ADVICE scenario: a headerless part whose first string field
    // legitimately starts with U+FEFF — the old content-compare guard
    // false-positived on it and silently skipped the intended BOM
    val dir = TestTmp.path("graft_r19_bom_lookalike")
    new java.io.File(dir).mkdirs()
    val data = "﻿x,1\ny,2\n".getBytes("UTF-8") // leads with EF BB BF
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.csv"), data)
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val out = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.csv"))
    assert(out.length == data.length + 3, "BOM was not prepended")
    assert(out.take(3).toSeq == bom.toSeq &&
      out.drop(3).toSeq == data.toSeq)
    // and the whole-pass marker makes a re-invocation a no-op
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val again = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.csv"))
    assert(again.toSeq == out.toSeq, "re-invocation double-prepended")
    // no protocol litter left behind
    val litter = new java.io.File(dir).list().filter(n =>
      n.endsWith(".orig") || n.endsWith(".bom"))
    assert(litter.isEmpty, litter.toSeq.toString)
  }

  test("prependBytes repairs a mid-copy crash: orig restored, rows intact, prefix stamped once") {
    val dir = TestTmp.path("graft_r19_bom_crash")
    new java.io.File(dir).mkdirs()
    val data = "a,1\nb,2\n".getBytes("UTF-8")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.csv"), data)
    // simulate a predecessor that died mid-copy: original renamed aside,
    // half-written tmp left behind, part missing
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "part-00000.csv"),
      java.nio.file.Paths.get(dir, "_part-00000.csv.orig"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_part-00000.csv.bom"),
      "GARBAGE-HALF-WRITE".getBytes("UTF-8"))
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    graft.sources.Fread.prependBytes(spark, dir, bom)
    val out = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.csv"))
    assert(out.take(3).toSeq == bom.toSeq && out.drop(3).toSeq == data.toSeq,
      "crash repair lost rows or the prefix")
    val litter = new java.io.File(dir).list().filter(n =>
      n.endsWith(".orig") || n.endsWith(".bom"))
    assert(litter.isEmpty, litter.toSeq.toString)
  }

  test("fwrite refuses bom/yaml with append= — the combination the marker fast-path relies on") {
    import spark.implicits._
    val dir = TestTmp.path("graft_r19_bom_append")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val df = Seq((1, "x")).toDF("k", "v").coalesce(1)
    graft.sources.Fread.fwrite(df, dir,
      graft.sources.Fread.FwriteOptions(bom = true, header = false))
    // prependBytes's whole-pass marker gates re-invocation per
    // directory; that is only sound because a prefixed dir can never
    // legally gain new parts — fwrite refuses bom/yaml under append=
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.Fread.fwrite(df, dir,
        graft.sources.Fread.FwriteOptions(bom = true, header = false,
          append = true))
    }
    assert(e1.getMessage.contains("bom=TRUE cannot combine"))
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Fread.fwrite(df, dir,
        graft.sources.Fread.FwriteOptions(yaml = true, append = true))
    }
    assert(e2.getMessage.contains("yaml=TRUE cannot combine"))
  }
}

/** Shared save/search shorthands for the round-19 LSH lifecycle tests. */
private object Similarity19 {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  def save(corpus: DataFrame, idx: String): Unit =
    graft.sim.Similarity.saveLshIndex(corpus, "vec_id", "embedding", idx,
      dim = 64, nBits = 4)
  def search(spark: SparkSession, idx: String, queries: DataFrame) =
    graft.sim.Similarity.lshTopKIndexed(spark, idx, queries,
      "vec_id", "embedding", dim = 64, nBits = 4, k = 5)
      .orderBy("query_id", "rk").collect().toSeq
}
