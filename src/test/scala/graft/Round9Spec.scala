package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.Windows

/** Round-9: judge + advisor items. The fix specs here pin (a) the
  * mixToTokenTargets totals-fit memo, (b) cum() naRm parity across the
  * prod family, (c) incrementalPairs output dedup under a
  * double-appended index, and (d) headOrdered/tailOrdered key
  * propagation + Int-range guard.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- mixToTokenTargets memo ------------------------------------------

  test("mixToTokenTargets memoizes the totals fit across calls and targets") {
    import graft.curate.Sampling
    val corpus = Seq(
      ("a", "one two three"), ("a", "four five"),
      ("b", "six"), ("b", "seven eight nine ten"))
      .toDF("source", "text")
    Sampling.clearFits()
    assert(Sampling.totalsFitCount == 0)
    val m1 = Sampling.mixToTokenTargets(corpus, col("text"), "source",
      graft.text.TextFunctions.tokenCount(col("text")),
      Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 100L)
    m1.count()
    assert(Sampling.totalsFitCount == 1)
    // second call — and a DIFFERENT mixture over the same corpus — both
    // hit the one memoized fit (totals don't depend on targets/budget)
    Sampling.mixToTokenTargets(corpus, col("text"), "source",
      graft.text.TextFunctions.tokenCount(col("text")),
      Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 100L).count()
    Sampling.mixToTokenTargets(corpus, col("text"), "source",
      graft.text.TextFunctions.tokenCount(col("text")),
      Map("a" -> 0.9), budgetTokens = 3L).count()
    assert(Sampling.totalsFitCount == 1)
    Sampling.clearFits()
    assert(Sampling.totalsFitCount == 0)
  }

  // ---- cum() naRm parity for prod --------------------------------------

  test("cum(prod) naRm=true skips nulls like the sum/min/max branches") {
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(3.0)), (4, Some(-1.0)))
      .toDF("o", "v").withColumn("g", lit("a"))
    val out = df.withColumn("p",
        Windows.cum("prod", $"v", Seq("g"), Seq($"o".asc), naRm = true))
      .orderBy($"o").select($"p").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // null at o=2 is SKIPPED, not poisoning: 2, 2, 6, -6
    assert(out(0).contains(2.0))
    assert(out(1).contains(2.0))
    assert(out(2).exists(v => math.abs(v - 6.0) < 1e-9))
    assert(out(3).exists(v => math.abs(v + 6.0) < 1e-9))
  }

  test("cum(prod) naRm=true on an all-null prefix is null (SQL agg parity)") {
    val df = Seq((1, None: Option[Double]), (2, Some(2.0)))
      .toDF("o", "v").withColumn("g", lit("a"))
    val out = df.withColumn("p",
        Windows.cum("prod", $"v", Seq("g"), Seq($"o".asc), naRm = true))
      .orderBy($"o").select($"p").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 2.0)
  }

  test("cum(prod_exact) poisons from the first null by default (collect_list drops nulls silently)") {
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(3.0)))
      .toDF("o", "v").withColumn("g", lit("a"))
    val strict = df.withColumn("p",
        Windows.cum("prod_exact", $"v", Seq("g"), Seq($"o".asc)))
      .orderBy($"o").select($"p").collect()
    assert(strict(0).getDouble(0) == 2.0)
    assert(strict(1).isNullAt(0) && strict(2).isNullAt(0))
    val rm = df.withColumn("p",
        Windows.cum("prod_exact", $"v", Seq("g"), Seq($"o".asc), naRm = true))
      .orderBy($"o").select($"p").collect()
    assert(rm(0).getDouble(0) == 2.0)
    assert(rm(1).getDouble(0) == 2.0)
    assert(rm(2).getDouble(0) == 6.0)
  }

  // ---- incrementalPairs under a double-appended index ------------------

  test("a double-appended index id yields no duplicate match rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9_idx").toString
    val base = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    Dedup.clearBases()
    Dedup.saveBandIndex(base, "doc_id", "text", tmp)
    // violate the caller contract: append doc 1 AGAIN
    Dedup.appendToBandIndex(base.filter($"doc_id" === 1L), "doc_id", "text", tmp)
    val out = Dedup.minhashIncrementalIndexed(spark, tmp, batch,
      "doc_id", "text").collect()
    // exactly ONE (10, 1) match despite doc 1 appearing twice in the index
    assert(out.length == 1)
    assert(out.head.getLong(0) == 10L && out.head.getLong(1) == 1L)
    Dedup.clearBases()
  }

  // ---- headOrdered / tailOrdered ---------------------------------------

  test("headOrdered/tailOrdered propagate the DT key") {
    val d = DT(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(d.headOrdered(2, Seq($"k".asc)).key == Seq("k"))
    assert(d.headOrdered(-1, Seq($"k".asc)).key == Seq("k"))
    assert(d.tailOrdered(2, Seq($"k".asc)).key == Seq("k"))
    assert(d.tailOrdered(-1, Seq($"k".asc)).key == Seq("k"))
    assert(d.headOrdered(-5, Seq($"k".asc)).df.count() == 0)
  }
}
