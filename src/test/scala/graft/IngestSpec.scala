package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curate.Ingest
import graft.dedup.Dedup

/** Composed daily-ingest loop: triage buckets are disjoint and complete,
  * the index grows by exactly the kept docs, and day 2 dedups against
  * day 1's survivors.
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog and then runs far away into the woods again"
  private def corpus = Seq((1L, good)).toDF("doc_id", "text")

  test("triage: reject short, drop intra-batch copy, match corpus dup, keep novel; day-2 loop") {
    val idx = TestTmp.dir("graft_ingest").toString
    Dedup.saveBandIndex(corpus, "doc_id", "text", idx)
    val novelText =
      "an entirely different long document about the spark catalyst planner and the rules of windows"
    val batch = Seq(
      (10L, good),                      // corpus near-dup
      (11L, "too short"),               // quality reject
      (12L, novelText),                 // novel — keep
      (13L, novelText)                  // intra-batch copy of 12 — drop
    ).toDF("doc_id", "text")
    val (kept, rejected, dups) = Ingest.ingestBatch(spark, idx, batch,
      "doc_id", "text", minTokens = 10)
    assert(rejected.select($"doc_id").as[Long].collect().toSeq == Seq(11L))
    assert(dups.select($"new_id").distinct().as[Long].collect().toSeq == Seq(10L))
    assert(kept.select($"doc_id").as[Long].collect().toSeq.sorted == Seq(12L))

    // day 2: a copy of yesterday's kept doc must now match the index
    val day2 = Seq((20L, novelText)).toDF("doc_id", "text")
    val (kept2, _, dups2) = Ingest.ingestBatch(spark, idx, day2,
      "doc_id", "text", minTokens = 10)
    assert(dups2.select($"dup_of").as[Long].collect().toSet == Set(12L))
    assert(kept2.count() == 0)
  }

  test("append=false leaves the index untouched") {
    val idx = TestTmp.dir("graft_ingest_dry").toString
    Dedup.saveBandIndex(corpus, "doc_id", "text", idx)
    val t = "a novel long document describing the behavior of rolling aggregates and ordered window frames"
    val batch = Seq((30L, t)).toDF("doc_id", "text")
    val (k1, _, _) = Ingest.ingestBatch(spark, idx, batch, "doc_id", "text",
      minTokens = 5, append = false)
    assert(k1.count() == 1)
    // same batch again: STILL novel — nothing was appended
    val (k2, _, d2) = Ingest.ingestBatch(spark, idx, batch, "doc_id", "text",
      minTokens = 5, append = false)
    assert(k2.count() == 1 && d2.count() == 0)
  }
}
