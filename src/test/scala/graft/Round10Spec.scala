package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Funcs

/** Round-10: judge + advisor items — week() mode migration parity and
  * the tests.Rraw tranche (dcast drop=FALSE × multiple value.var,
  * rbindlist ignore.attr, foverlaps within × mult, shift give.names).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- week(mode=) migration (src/idatetime.c:148-173) ----------------

  test("week modes: the reference's own Jan-7 example and edge days") {
    // reference warning text: as.IDate('2023-01-07') is week 2 in
    // legacy mode but week 1 in sequential (week 2 starts on Jan 8)
    val df = Seq("2023-01-01", "2023-01-06", "2023-01-07", "2023-01-08",
      "2023-12-31", "2024-12-31") // 2024 is a leap year: yday 366
      .toDF("d").withColumn("d", to_date(col("d")))
    val got = df.select(col("d").cast("string"),
        Funcs.week(col("d")).as("legacy"),
        Funcs.week(col("d"), "sequential").as("seq"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got("2023-01-01") == ((1, 1)))
    assert(got("2023-01-06") == ((1, 1)))   // yday 6: 6/7+1=1, 5/7+1=1
    assert(got("2023-01-07") == ((2, 1)))   // the migration's example
    assert(got("2023-01-08") == ((2, 2)))
    assert(got("2023-12-31") == ((53, 53))) // yday 365: 52+1 / 52+1
    assert(got("2024-12-31") == ((53, 53))) // yday 366: 366/7+1=53, 365/7+1=53
    intercept[IllegalArgumentException](Funcs.week(col("d"), "iso"))
  }

  // ---- benchGramSet memo (q_curation_pipeline's round-9 regression) ---

  test("benchGramSet is persisted once per (bench, n) and evicted by clearFits") {
    import graft.curate.Contamination
    val bench = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    Contamination.clearFits()
    assert(Contamination.gramSetCount == 0)
    val g1 = Contamination.benchGramSet(bench, "doc_id", "text", n = 3)
    g1.count()
    assert(Contamination.gramSetCount == 1)
    assert(Contamination.gramSetFrames.values.forall(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE))
    // same bench + n → the same memoized frame; different n → a second
    Contamination.benchGramSet(bench, "doc_id", "text", n = 3).count()
    assert(Contamination.gramSetCount == 1)
    Contamination.benchGramSet(bench, "doc_id", "text", n = 2).count()
    assert(Contamination.gramSetCount == 2)
    // the composed path (decontaminate → ngramOverlap) hits the memo too
    val corpus = Seq((10L, "alpha beta gamma delta tail"), (11L, "unrelated words here"))
      .toDF("doc_id", "text")
    val kept = Contamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
    assert(Contamination.gramSetCount == 2)
    val frames = Contamination.gramSetFrames.values.toSeq
    Contamination.clearFits()
    assert(Contamination.gramSetCount == 0)
    assert(frames.forall(
      _.storageLevel == org.apache.spark.storage.StorageLevel.NONE))
  }

  // ---- distributed bloom build (giant-bench tier) ----------------------

  test("distributed bloom build == driver bloom == exact overlap; no gram collect") {
    import graft.curate.Contamination
    Contamination.clearFits()
    val corpus = (1L to 200L).map(i =>
      (i, s"doc $i alpha beta ${if (i % 5 == 0) "gamma delta shared tail" else s"unique $i words"}"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "gamma delta shared tail marker"),
      (901L, "totally different eval item")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = norm(Contamination.ngramOverlap(corpus, bench, "doc_id", "text", n = 3))
    val drv = norm(Contamination.ngramOverlapBloom(corpus, bench, "doc_id", "text", n = 3))
    val dist = norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3))
    assert(exact.nonEmpty && exact == drv && exact == dist)
    // an explicit estimate also works (no count job) and stays exact
    Contamination.clearFits()
    val dist2 = norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3, estimatedGrams = 10000L))
    assert(dist2 == exact)
    // the distributed build's fit memoizes like the driver tier's
    val fits = Contamination.bloomFitCount
    norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3, estimatedGrams = 10000L))
    assert(Contamination.bloomFitCount == fits)
  }

  // ---- foverlaps validate=true: eager NA refusal (advisor item) --------

  test("overlap(validate=true) errors eagerly even when NA rows would never evaluate") {
    import graft.operators.Joins
    val x = Seq((1, 5, "a"), (10, 12, "b")).toDF("s", "e", "v")
    val xNa = Seq((Option(1), Option(5), "a"), (Option(10), Option.empty[Int], "b"))
      .toDF("s", "e", "v")
    val y = Seq((2, 4)).toDF("ys", "ye")
    // clean frames pass under validate
    assert(Joins.overlap(x, y, Nil, "s", "e", "ys", "ye",
      autoBin = false, validate = true).count() == 1)
    // the lazy fused guard alone can be bypassed by a pushed filter
    // that removes the NA row before evaluation; validate=true matches
    // the reference's always-errors anyNA semantics
    val ex = intercept[IllegalArgumentException] {
      Joins.overlap(xNa, y, Nil, "s", "e", "ys", "ye",
        autoBin = false, validate = true)
    }
    assert(ex.getMessage.contains("NA values in data.table x 'end' column: 'e'"))
    assert(ex.getMessage.contains("must be removed for foverlaps() to work"))
  }
}
