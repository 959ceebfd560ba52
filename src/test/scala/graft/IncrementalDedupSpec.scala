package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Incremental (batch-vs-corpus) minhash dedup: the parquet-index path
  * must agree with the DataFrame path, matches must be cross-side only,
  * and the base-bucket cap must drop exactly the audited buckets.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // A corpus with a boilerplate cluster (ids 1..4 near-identical), a
  // novel doc, and a batch carrying one near-dup of the cluster plus one
  // novel doc. Texts are long enough that 3-gram shingles overlap hard.
  private def base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "the quick brown fox jumps over the lazy dog again and once more"),
    (4L, "an entirely different document about spark catalyst planning rules"),
    (5L, "yet another unrelated text concerning rolling window aggregates")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (100L, "the quick brown fox jumps over the lazy dog again and again"),
    (101L, "completely novel content that matches nothing in the corpus at all")
  ).toDF("doc_id", "text")

  test("batch near-dup of the cluster is matched; novel doc is not") {
    val out = Dedup.minhashIncrementalPortable(base, batch, "doc_id", "text")
      .orderBy($"new_id", $"dup_of")
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._1 == 100L), s"novel doc matched: $out")
    assert(out.map(_._2).contains(1L))
    // cross-side only: no base-base or batch-batch ids in either column
    assert(out.forall { case (n, d) => n >= 100L && d < 100L })
  }

  test("indexed path == DataFrame path after save/load round-trip") {
    val dir = TestTmp.dir("graft_bandidx").toString
    Dedup.saveBandIndex(base, "doc_id", "text", dir)
    val direct = Dedup.minhashIncrementalPortable(base, batch, "doc_id", "text")
      .orderBy($"new_id", $"dup_of")
      .as[(Long, Long, Double)].collect().toSeq
    val indexed = Dedup.minhashIncrementalIndexed(spark, dir, batch, "doc_id", "text")
      .orderBy($"new_id", $"dup_of")
      .as[(Long, Long, Double)].collect().toSeq
    assert(indexed == direct)
    assert(direct.nonEmpty)
  }

  test("maxBucket caps the base side: capped run drops the oversized bucket's matches") {
    // cap of 1 drops every base bucket holding the 3-doc cluster, so the
    // cluster match disappears while buckets of size 1 survive
    val capped = Dedup.minhashIncrementalPortable(base, batch, "doc_id", "text",
        maxBucket = 1)
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    val uncapped = Dedup.minhashIncrementalPortable(base, batch, "doc_id", "text")
      .select($"new_id", $"dup_of").collect()
    assert(capped.size < uncapped.length)
    // and the dropped buckets are exactly what the base-corpus audit reports
    val audited = Dedup.minhashOversizedPortable(base, "doc_id", "text", maxBucket = 1)
      .count()
    assert(audited > 0)
  }

  test("ingest loop: append day-1 novel docs, day-2 batch matches them") {
    val dir = TestTmp.dir("graft_bandidx_loop").toString
    Dedup.saveBandIndex(base, "doc_id", "text", dir)
    // day 1: doc 101 is novel → append it
    val day1 = batch.filter($"doc_id" === 101L)
    val m1 = Dedup.minhashIncrementalIndexed(spark, dir, day1, "doc_id", "text")
    assert(m1.count() == 0)
    Dedup.appendToBandIndex(day1, "doc_id", "text", dir)
    // day 2: a re-post of doc 101 must now match the GROWN index
    val day2 = Seq(
      (200L, "completely novel content that matches nothing in the corpus at all")
    ).toDF("doc_id", "text")
    val m2 = Dedup.minhashIncrementalIndexed(spark, dir, day2, "doc_id", "text")
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    assert(m2.contains((200L, 101L)), s"day-2 batch must match appended doc: $m2")
  }

  test("bucketed catalog index: same matches, zero corpus-side exchange") {
    Dedup.saveBandIndexBucketed(base, "doc_id", "text", "inc_idx_spec", buckets = 4)
    try {
      val direct = Dedup.minhashIncrementalPortable(base, batch, "doc_id", "text")
        .orderBy($"new_id", $"dup_of").as[(Long, Long, Double)].collect().toSeq
      val bucketed = Dedup.minhashIncrementalBucketed(spark, "inc_idx_spec",
          batch, "doc_id", "text")
        .orderBy($"new_id", $"dup_of").as[(Long, Long, Double)].collect().toSeq
      assert(bucketed == direct && direct.nonEmpty)
      // the (band, bh) bucket aggregation must consume the table's
      // bucketing instead of shuffling the corpus banding
      val agg = spark.table("inc_idx_spec_banded")
        .groupBy($"band", $"bh").agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed banding still shuffles:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS inc_idx_spec_shingles") ::
      spark.sql("DROP TABLE IF EXISTS inc_idx_spec_banded") :: Nil
  }

  test("bucketed save survives an ORPHAN warehouse directory (fresh-metastore restart)") {
    // a new session's metastore doesn't know tables an old session
    // wrote, but their directories persist under warehouse.dir —
    // reproduce that state with an orphan dir and no catalog entry
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val orphan = new org.apache.hadoop.fs.Path(warehouse, "inc_idx_orphan_shingles")
    val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(orphan)
    spark.sql("DROP TABLE IF EXISTS inc_idx_orphan_shingles")
    spark.sql("DROP TABLE IF EXISTS inc_idx_orphan_banded")
    try {
      Dedup.saveBandIndexBucketed(base, "doc_id", "text", "inc_idx_orphan", buckets = 2)
      val m = Dedup.minhashIncrementalBucketed(spark, "inc_idx_orphan",
        batch, "doc_id", "text")
      assert(m.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_idx_orphan_shingles")
      spark.sql("DROP TABLE IF EXISTS inc_idx_orphan_banded")
    }
  }

  test("no self-pairs when a batch doc id collides with a base doc id") {
    // same id on both sides (re-ingest): match is still reported — the
    // caller decides identity policy; engine must not silently drop it
    val b2 = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashIncrementalPortable(base, b2, "doc_id", "text")
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    assert(out.contains((1L, 1L)))
  }
}
