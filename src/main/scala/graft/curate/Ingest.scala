package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** The composed DAILY INGEST loop — the operational shape a 100 TB
  * corpus actually runs: a new batch of documents flows through
  *
  *   1. quality gate (Gopher-style heuristics, stateless map),
  *   2. intra-batch exact dedup (canonical md5 keep-first),
  *   3. near-dup match against the STANDING corpus's persisted band
  *      index ([[graft.dedup.Dedup.minhashIncrementalIndexed]] — the
  *      corpus is never re-shingled),
  *   4. append the surviving novel docs into the index so tomorrow's
  *      batch dedups against today's.
  *
  * Every stage is one of the library's audited operators — this type
  * just pins the composition order and returns the full triage so the
  * pipeline is observable: (kept, rejectedQuality, dupOfCorpus).
  * Nothing here is new machinery; specs assert the composition against
  * the stages run by hand.
  */
object Ingest {

  /** @param indexPath [[graft.dedup.Dedup.saveBandIndex]] location of
    *                   the standing corpus
    * @param append     false = dry-run triage (report only, index
    *                   untouched)
    * @return (kept novel docs, quality rejects, corpus near-dup matches)
    */
  def ingestBatch(spark: SparkSession, indexPath: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  minTokens: Int = 50, threshold: Double = 0.5,
                  append: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    // 1. quality gate — stateless, map-side
    val scored = TextFunctions.withGopherFilter(batch, textCol,
      minTokens = minTokens)
    val rejected = scored.filter(!col("f.keep")).select(batch.columns.map(col): _*)
    val quality = scored.filter(col("f.keep")).select(batch.columns.map(col): _*)

    // 2. intra-batch exact dedup (canonical text, keep lowest id)
    val canon = quality.withColumn("_graft_cfp",
      md5(TextFunctions.canonicalize(col(textCol))))
    val keepFirst = canon.groupBy(col("_graft_cfp"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val unique = canon.join(keepFirst, Seq(idCol)).drop("_graft_cfp")

    // 3. near-dup match vs the persisted corpus index
    val dups0 = Dedup.minhashIncrementalIndexed(spark, indexPath, unique,
      idCol, textCol, threshold = threshold)

    // 4. fold today's novel docs in for tomorrow. Spark plans are LAZY:
    // both returned frames would otherwise re-read the index AFTER the
    // append and report the batch's own rows as duplicates of
    // themselves — so the dup list (and novel, derived from it) is
    // materialized to pin the PRE-append snapshot before writing.
    if (append) {
      // localCheckpoint TRUNCATES lineage — persist() alone is not
      // enough here (a cache miss would replay the scan over the
      // now-appended files and report the batch as its own duplicate)
      val dups = dups0.localCheckpoint(true)
      val novel = unique.join(dups.select(col("new_id").as(idCol)).distinct(),
          Seq(idCol), "left_anti").localCheckpoint(true)
      Dedup.appendToBandIndex(novel, idCol, textCol, indexPath)
      (novel, rejected, dups)
    } else {
      val novel = unique.join(dups0.select(col("new_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      (novel, rejected, dups0)
    }
  }
}
