package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.{Joins, Windows}

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
    val tmp = TestTmp.dir("graft_r9_idx").toString
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

  // ---- reference edge-case ports (round-9 item 6) ----------------------

  test("roll=nearest tie-break picks the LOWER value (src/bmerge.c: LOWDIST <= UPPDIST)") {
    // probe t=15 sits exactly between x at 10 and 20 → reference rolls LOW
    val x = Seq((1, 10, "lo"), (1, 20, "hi")).toDF("g", "t", "v")
    val i = Seq((1, 15), (1, 5), (1, 25)).toDF("g", "t")
    val out = Joins.asof(x, i, Seq("g"), "t", Joins.Nearest, Seq("v"))
      .orderBy($"t").select($"t", $"v").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    // default rollends c(TRUE,TRUE): both extremes extrapolate
    assert(out.toSeq == Seq(5 -> "lo", 15 -> "lo", 25 -> "hi"))
  }

  test("roll=nearest honors rollends: a disabled end stops extrapolating") {
    val x = Seq((1, 10, "lo"), (1, 20, "hi")).toDF("g", "t", "v")
    val i = Seq((1, 5), (1, 15), (1, 25)).toDF("g", "t")
    def run(re: (Boolean, Boolean)) =
      Joins.asof(x, i, Seq("g"), "t", Joins.Nearest, Seq("v"), rollends = Some(re))
        .orderBy($"t").select($"t", $"v").collect()
        .map(r => r.getInt(0) -> Option(r.getString(1))).toSeq
    assert(run((false, true)) ==
      Seq(5 -> None, 15 -> Some("lo"), 25 -> Some("hi")))
    assert(run((true, false)) ==
      Seq(5 -> Some("lo"), 15 -> Some("lo"), 25 -> None))
    assert(run((false, false)) ==
      Seq(5 -> None, 15 -> Some("lo"), 25 -> None))
  }

  test("mult='error' raises with the reference's message (src/bmerge.c:417)") {
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      Joins.assertNoDup(dup, Seq("k"))
    }
    assert(ex.getMessage.contains("mult='error' and multiple matches during merge"))
  }

  test("foverlaps refuses NA interval ends with the reference's message (R/foverlaps.R:58-73)") {
    val x = Seq((1, Some(5), Some(10)), (2, None, Some(4)))
      .toDF("id", "s", "e")
    val y = Seq((9, 1, 20)).toDF("yid", "ys", "ye")
    val ex = intercept[Exception] {
      Joins.overlap(x, y, Nil, "s", "e", "ys", "ye").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains(
      "All rows with NA values in the range columns must be removed")),
      s"got: ${msgs(ex).mkString(" | ")}")
    // clean ranges still join (type='equal' included)
    val xc = Seq((1, 5, 10)).toDF("id", "s", "e")
    val yc = Seq((9, 5, 10), (8, 5, 11)).toDF("yid", "ys", "ye")
    val eq = Joins.overlap(xc, yc, Nil, "s", "e", "ys", "ye", typ = "equal")
    assert(eq.select($"yid").as[Int].collect().toSeq == Seq(9))
  }

  // ---- NA-join default plan lock ---------------------------------------

  test("DT.join default (nullSafe) still plans a hash/merge join — no nested loop") {
    // The round-9 default flip to <=> must not degrade the plan:
    // ExtractEquiJoinKeys accepts EqualNullSafe, so the join stays a
    // broadcast/shuffled hash (or sort-merge) join at any size.
    val x = (1 to 100).map(i => (i, if (i % 7 == 0) None else Some(i % 5)))
      .toDF("xid", "k")
    val y = (1 to 50).map(j => (j, if (j % 6 == 0) None else Some(j % 5)))
      .toDF("yid", "k")
    val joined = DT(x).join(DT(y), Seq("k"), "inner").df
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"null-safe default fell off the equi-join path:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"null-safe default planned a nested loop:\n$plan")
    joined.count() // and it executes
  }

  // ---- bucketed-index query-path plan lock (round-9 item 5) ------------

  test("bucketed band-index bucket aggregation plans with ZERO Exchange") {
    // SetIndexSpec locks the setkey path; this locks the SEARCH path's
    // corpus side: the (band, bh)-bucketed catalog scan carries hash-
    // clustered outputPartitioning, so the per-bucket collect_list
    // aggregates with no shuffle at all. This is the plan the memoized
    // cappedBucketsFor materializes on its first (and only) run — the
    // 2.77 s round-8 warm cost of q_dedup_incr_bucketed was this
    // aggregation re-running at every rep, not a shuffle.
    val tbl = "graft_r9_planlock"
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    Dedup.saveBandIndexBucketed(docs, "doc_id", "text", tbl)
    val agg = spark.table(s"${tbl}_banded")
      .groupBy($"band", $"bh")
      .agg(collect_list($"id").as("base_ids"))
    agg.count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed corpus aggregation shuffled:\n$plan")
    // and the full search against it still matches the planted dup
    val batch = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    Dedup.clearBases()
    val out = Dedup.minhashIncrementalBucketed(spark, tbl, batch,
      "doc_id", "text").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((10L, 1L), (10L, 3L)))
    Dedup.clearBases()
    graft.operators.Scale.dropTableAndLocation(spark, s"${tbl}_shingles")
    graft.operators.Scale.dropTableAndLocation(spark, s"${tbl}_banded")
  }

  test("index-buckets memo: second search reuses the aggregation; append evicts") {
    val tmp = TestTmp.dir("graft_r9_memo").toString
    val base = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    Dedup.clearBases()
    Dedup.saveBandIndex(base, "doc_id", "text", tmp)
    Dedup.minhashIncrementalIndexed(spark, tmp, batch, "doc_id", "text").count()
    val afterFirst = Dedup.persistedKeys.filter(_.startsWith("idxbuckets:"))
    assert(afterFirst.size == 1)
    Dedup.minhashIncrementalIndexed(spark, tmp, batch, "doc_id", "text").count()
    assert(Dedup.persistedKeys.filter(_.startsWith("idxbuckets:")) == afterFirst)
    // appending to the index must evict the memo (stale buckets would
    // miss every match against the appended docs)
    Dedup.appendToBandIndex(
      Seq((3L, "lambda mu nu xi omicron")).toDF("doc_id", "text"),
      "doc_id", "text", tmp)
    assert(Dedup.persistedKeys.filter(_.startsWith("idxbuckets:")).isEmpty)
    val batch2 = Seq((11L, "lambda mu nu xi omicron")).toDF("doc_id", "text")
    val out = Dedup.minhashIncrementalIndexed(spark, tmp, batch2,
      "doc_id", "text").collect()
    assert(out.length == 1 && out.head.getLong(1) == 3L)
    Dedup.clearBases()
  }

  // ---- fwrite round-trips: logical01, write.csv datetimes, csvy --------

  test("fwrite logical01 writes 1/0; default writes TRUE/FALSE (R/fwrite.R:6)") {
    import graft.sources.Fread
    val df = Seq((1L, Some(true)), (2L, Some(false)), (3L, None: Option[Boolean]))
      .toDF("id", "flag")
    val p01 = TestTmp.dir("graft_l01").toString + "/out"
    Fread.fwrite(df, p01, Fread.FwriteOptions(logical01 = true, na = "NA"))
    val raw01 = spark.read.text(p01).as[String].collect().toSet
    assert(raw01.contains("1,1") && raw01.contains("2,0") && raw01.contains("3,NA"),
      s"got $raw01")
    val pTf = TestTmp.dir("graft_tf").toString + "/out"
    Fread.fwrite(df, pTf, Fread.FwriteOptions(na = "NA"))
    val rawTf = spark.read.text(pTf).as[String].collect().toSet
    assert(rawTf.contains("1,TRUE") && rawTf.contains("2,FALSE") && rawTf.contains("3,NA"),
      s"got $rawTf")
  }

  test("fwrite dateTimeAs=write.csv renders space-separated local form (R/fwrite.R:8)") {
    import graft.sources.Fread
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-03-05 06:07:08")))
      .toDF("id", "ts")
    val p = TestTmp.dir("graft_wcsv").toString + "/out"
    Fread.fwrite(df, p, Fread.FwriteOptions(dateTimeAs = "write.csv"))
    val raw = spark.read.text(p).as[String].collect().toSet
    assert(raw.contains("1,2024-03-05 06:07:08"), s"got $raw")
  }

  test("fwrite(yaml=TRUE) emits csvy front matter that fread(yaml=TRUE) round-trips") {
    import graft.sources.Fread
    val df = Seq(
      (1L, "alpha", 1.5, true, java.sql.Date.valueOf("2024-01-02")),
      (2L, "beta, with comma", 2.5, false, java.sql.Date.valueOf("2024-03-04")))
      .toDF("id", "name", "score", "flag", "d")
    val p = TestTmp.dir("graft_csvy").toString + "/out"
    Fread.fwrite(df, p, Fread.FwriteOptions(yaml = true))
    // front matter parses: names + written types + dialect
    val h = Fread.csvyHeader(spark, p)
    assert(h.schema.map(_.fieldNames.toSeq).contains(
      Seq("id", "name", "score", "flag", "d")))
    assert(h.sep.contains(",") && h.header.contains(true) && h.skipLines > 0)
    // and the full read reconstructs values AND types
    val back = Fread.fread(spark, p, Fread.FreadOptions(yaml = true))
      .orderBy($"id")
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("score").dataType.typeName == "double")
    assert(back.schema("flag").dataType.typeName == "boolean")
    assert(back.schema("d").dataType.typeName == "date")
    val rows = back.collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha" && rows(1).getString(1) == "beta, with comma")
    assert(rows(0).getBoolean(3) && !rows(1).getBoolean(3))
    assert(rows(1).getDate(4).toString == "2024-03-04")
  }

  // ---- headOrdered / tailOrdered ---------------------------------------

  // ---- bloom-prefiltered decontamination -------------------------------

  test("ngramOverlapBloom == ngramOverlap exactly; gate is in the plan; fit memoized") {
    import graft.curate.Contamination
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma something else entirely here"),
      (4L, "totally unrelated words nothing shared at all"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta"), (101L, "five six seven"))
      .toDF("doc_id", "text")
    Contamination.clearFits()
    val exact = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bloom = Contamination.ngramOverlapBloom(corpus, bench, "doc_id", "text", n = 3)
    val got = bloom.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == exact && got.nonEmpty, s"bloom $got vs exact $exact")
    // the map-side gate is really in the plan
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"))
    // second call reuses the ONE memoized driver-side filter build
    assert(Contamination.bloomFitCount == 1)
    Contamination.ngramOverlapBloom(corpus, bench, "doc_id", "text", n = 3).count()
    assert(Contamination.bloomFitCount == 1)
    Contamination.clearFits()
    assert(Contamination.bloomFitCount == 0)
  }

  // ---- count-min sketch ------------------------------------------------

  test("cmsFit: estimates bound exact counts from above within eps*N; fit memoized") {
    import graft.functions.Sketches
    val rows = (1 to 300).map(i =>
      if (i % 3 == 0) "common" else if (i % 7 == 0) "mid" else s"rare$i")
    val df = rows.toDF("w")
    Sketches.clearFits()
    val cms = Sketches.cmsFit(df, col("w"), eps = 0.01, confidence = 0.99, seed = 1)
    assert(cms.totalCount == 300L)
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val slack = math.ceil(300 * 0.01).toLong
    for ((w, n) <- exact) {
      val e = cms.estimateCount(w)
      assert(e >= n && e <= n + slack, s"$w: est $e vs exact $n (slack $slack)")
    }
    assert(Sketches.cmsFitCount == 1)
    Sketches.cmsFit(df, col("w"), eps = 0.01, confidence = 0.99, seed = 1)
    assert(Sketches.cmsFitCount == 1)
    // a different seed is a different fit (deterministic per seed)
    val cms2 = Sketches.cmsFit(df, col("w"), eps = 0.01, confidence = 0.99, seed = 2)
    assert(Sketches.cmsFitCount == 2 && cms2.totalCount == 300L)
    Sketches.clearFits()
    assert(Sketches.cmsFitCount == 0)
  }

  // ---- shuffleShard ----------------------------------------------------

  test("shuffleShard: per-shard positions are a contiguous 1..n permutation; deterministic; seed-sensitive") {
    import graft.curate.Sampling
    val df = (1 to 400).toDF("id")
    val sh = Sampling.shuffleShard(df, col("id"), numShards = 4, seed = 7L)
      .select(col("id"), col("shard"), col("pos"))
    val rows = sh.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == 400 && rows.map(_._1).distinct.length == 400)
    // contiguous 1..n positions inside every shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length))
    }
    // every shard populated and no shard hogs the corpus (hash balance)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3) && sizes.values.max <= 200)
    // identical permutation on re-evaluation
    val again = sh.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // a different seed draws a different permutation
    val other = Sampling.shuffleShard(df, col("id"), numShards = 4, seed = 8L)
      .select(col("id"), col("shard"), col("pos"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(other.sortBy(_._1).toSeq != rows.sortBy(_._1).toSeq)
  }

  // ---- transpose keep.names / make.names -------------------------------

  test("transpose: keep.names=None drops old names; make.names=false yields V1..Vn (R/transpose.Rd)") {
    import graft.operators.Reshape
    val df = Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("id", "a", "b")
    // default (historical): old names kept as "column", new names = id values
    val d0 = Reshape.transpose(df, "id")
    assert(d0.columns.toSeq == Seq("column", "1", "2"))
    // keep.names=NULL parity: the names column is dropped
    val d1 = Reshape.transpose(df, "id", keepNames = None)
    assert(d1.columns.toSeq == Seq("1", "2") && d1.count() == 2)
    // make.names=NULL parity: V1..Vn in row (orderCol) order
    val d2 = Reshape.transpose(df, "id", keepNames = Some("rn"), makeNames = false)
    assert(d2.columns.toSeq == Seq("rn", "V1", "V2"))
    val rows = d2.orderBy(col("rn")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getDouble(1) == 10.0 && rows(0).getDouble(2) == 20.0)
    assert(rows(1).getDouble(1) == 100.0 && rows(1).getDouble(2) == 200.0)
  }

  test("transpose(makeNames=false): null order value and V-colliding values survive") {
    import graft.operators.Reshape
    // orderCol values "B" and "V1": a rename CHAIN would alias both
    // onto V2; the select projection must not
    val d = Seq(("B", 1.0), ("V1", 2.0)).toDF("k", "x")
    val t = Reshape.transpose(d, "k", keepNames = Some("rn"), makeNames = false)
    assert(t.columns.toSeq == Seq("rn", "V1", "V2"))
    val r = t.collect().head
    assert(r.getString(0) == "x" && r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0)
    // a null order value pivots to the "null" column and still renames
    val dn = Seq((Some("a"), 1.0), (None, 2.0)).toDF("k", "x")
    val tn = Reshape.transpose(dn, "k", keepNames = None, makeNames = false)
    assert(tn.columns.toSeq == Seq("V1", "V2") && tn.count() == 1)
  }

  test("headOrdered/tailOrdered propagate the DT key") {
    val d = DT(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(d.headOrdered(2, Seq($"k".asc)).key == Seq("k"))
    assert(d.headOrdered(-1, Seq($"k".asc)).key == Seq("k"))
    assert(d.tailOrdered(2, Seq($"k".asc)).key == Seq("k"))
    assert(d.tailOrdered(-1, Seq($"k".asc)).key == Seq("k"))
    assert(d.headOrdered(-5, Seq($"k".asc)).df.count() == 0)
  }
}
