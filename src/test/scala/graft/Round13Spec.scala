package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GlobalOrdered, Reshape, Windows}

/** Round-13 hardening: the frolladapt phantom-volume guard (a value
  * reach spanning the axis must reduce buckets instead of copying
  * ~data x buckets rows into the phantom union) and the bench
  * vs-previous regression gate (real JSON parsing; the gate now also
  * fires during load-contaminated sweeps via the min rep).
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- frolladapt phantom guard -------------------------------------

  test("phantomRatioEst: local reach is cheap, axis-spanning reach is quadratic") {
    // 31 uniform bounds over [0,1000) ~ 32 buckets of width ~32
    val bounds: Array[Any] = (1 until 32).map(i => i * 31.25: Any).toArray
    // reach well under one bucket width: < 1x the data
    assert(GlobalOrdered.phantomRatioEst(bounds, 10.0) <= 1.0)
    // reach = full axis: every bucket d copies all d prior buckets,
    // sum ~ buckets/2
    val wide = GlobalOrdered.phantomRatioEst(bounds, 1000.0)
    assert(wide > 10.0)
    // degenerate inputs estimate zero
    assert(GlobalOrdered.phantomRatioEst(Array.empty[Any], 100.0) == 0.0)
    assert(GlobalOrdered.phantomRatioEst(bounds, 0.0) == 0.0)
  }

  test("frolladapt guard fires on reach ~ axis span: fewer buckets, same results") {
    GlobalOrdered.clearFits()
    val df = spark.range(0, 2000).select(
      col("id").as("k"), (col("id") % 997).as("t"))
      .withColumn("t", col("t") + col("k") / 2) // spread, still 0..~1996
      .repartition(8)
    val before = GlobalOrdered.phantomGuardReductions.get()
    // reach 1499 over an axis of ~2000: phantom estimate ~14x the data
    // at 32 buckets (at the test session's 4 default buckets the true
    // volume is a harmless ~0.75x — the guard correctly stays quiet
    // there, so the stress case pins buckets explicitly)
    val guarded = GlobalOrdered.frolladapt(df, col("t"), 1500L, "an",
      buckets = 32)
    val naive = Windows.frolladaptDF(
      df, "an", col("t"), 1500L, Nil, allowGlobal = true)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("an")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(guarded) == m(naive))
    assert(GlobalOrdered.phantomGuardReductions.get() > before)
    // memoized: a second build of the same plan must not re-warn/count
    GlobalOrdered.frolladapt(df, col("t"), 1500L, "an", buckets = 32)
    assert(GlobalOrdered.phantomGuardReductions.get() == before + 1)
    // a local reach on the same fit stays unguarded
    val local = GlobalOrdered.frolladapt(df, col("t"), 5L, "an2", buckets = 32)
    val naiveLocal = Windows.frolladaptDF(
      df, "an2", col("t"), 5L, Nil, allowGlobal = true)
    def m2(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("an2")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m2(local) == m2(naiveLocal))
    assert(GlobalOrdered.phantomGuardReductions.get() == before + 1)
  }

  test("chained global ops alias the fit: one quantile scan, not one per link") {
    GlobalOrdered.clearFits()
    val df = spark.range(0, 5000).select(
      col("id").as("k"), (col("id") % 7).cast("double").as("v"))
      .repartition(4)
    val scans0 = GlobalOrdered.fitScans.get()
    val s1 = GlobalOrdered.shift(df, col("v"), 1, col("k"), "p1",
      fill = lit(0.0), buckets = 8)
    assert(GlobalOrdered.fitScans.get() == scans0 + 1)
    // chained op on the OUTPUT: row-preserving, so the fit is aliased —
    // no second scan THROUGH s1's phantom/window plan
    val s2 = GlobalOrdered.shift(s1, col("v"), -1, col("k"), "p2",
      fill = lit(0.0), buckets = 8)
    assert(GlobalOrdered.fitScans.get() == scans0 + 1)
    // ...and a third link, different op family, same key
    val s3 = GlobalOrdered.cumsum(s2, col("v"), col("k"), "cs", buckets = 8)
    assert(GlobalOrdered.fitScans.get() == scans0 + 1)
    // values still exact vs the naive single-partition plan
    val naive = df
      .withColumn("p1", coalesce(
        lag(col("v"), 1).over(Window.orderBy(col("k"))), lit(0.0)))
      .withColumn("p2", coalesce(
        lead(col("v"), 1).over(Window.orderBy(col("k"))), lit(0.0)))
      .withColumn("cs", sum(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("p1"), col("p2"), col("cs")).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    assert(m(s3) == m(naive))
  }

  test("shiftN by=Nil: one shiftMulti pass for the whole n vector") {
    GlobalOrdered.clearFits()
    val df = spark.range(0, 3000).select(
      col("id").as("k"), (col("id") % 11).cast("double").as("v"))
      .repartition(4)
    val scans0 = GlobalOrdered.fitScans.get()
    val out = Windows.shiftN(df, Seq("v"), Seq(1, 3, -2), Nil,
      Seq(col("k").asc))
    assert(GlobalOrdered.fitScans.get() == scans0 + 1)
    out.collect() // force
    // one phantom union set for the whole vector: <= 1 Union node (the
    // before+after phantom sides fold into one multi-child union); the
    // per-width fold stacked one per n
    val unions = out.queryExecution.executedPlan.collect {
      case u: org.apache.spark.sql.execution.UnionExec => u
    }
    assert(unions.size <= 1, s"expected one phantom union, got ${unions.size}")
    val naive = df
      .withColumn("v_lag_1", lag(col("v"), 1).over(Window.orderBy(col("k"))))
      .withColumn("v_lag_3", lag(col("v"), 3).over(Window.orderBy(col("k"))))
      .withColumn("v_lead_2", lead(col("v"), 2).over(Window.orderBy(col("k"))))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("v_lag_1"), col("v_lag_3"), col("v_lead_2"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(m(out) == m(naive))
  }

  test("q_cumsum_global_skew drives the collapse-reroute path and stays deterministic") {
    GlobalOrdered.clearFits()
    val before = GlobalOrdered.collapseReroutes.get()
    val q = SparkEntry.queries("q_cumsum_global_skew")
    val out1 = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 99%-zero key collapses the fit; cumsum is tie-agnostic, so the
    // tier reroutes (counted once per memoized fit)
    assert(GlobalOrdered.collapseReroutes.get() > before)
    // constant-block rows sum zeros: order-invariant, so a rebuild from a
    // fresh fit reproduces the exact map
    GlobalOrdered.clearFits()
    val out2 = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out1 == out2)
    assert(out1.nonEmpty && out1.values.exists(_ > 0))
  }

  test("global frank over a column vector matches the naive plan, all ties methods") {
    // frankv(cols=, order=) (tests.Rraw 2386.*): ties in the FIRST
    // column resolved by the second (desc), nulls in the second column,
    // heavy ties on the tuple itself
    GlobalOrdered.clearFits()
    val rows = (1 to 400).map { i =>
      val c2: java.lang.Double = if (i % 13 == 0) null else (i % 5).toDouble
      (i.toLong, (i % 20).toLong, c2)
    }
    val df = spark.createDataFrame(rows).toDF("id", "c1", "c2").repartition(4)
    val ord = Seq(col("c1").asc_nulls_last, col("c2").desc_nulls_last)
    val tie = Seq(col("c1"), col("c2"))
    for (ties <- Seq("min", "dense", "max", "average")) {
      val routed = Windows.frank(df, ord, tie, ties, Nil, "rk")
      val naive = Windows.frank(df, ord, tie, ties, Nil, "rk",
        allowGlobal = true)
      def m(d: org.apache.spark.sql.DataFrame) =
        d.select(col("id"), col("rk").cast("double")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m(routed) == m(naive), s"ties=$ties")
    }
    // ties="first" with appearance; and the multi-col na.last="keep"
    // path: ANY-null rows get null ranks, survivors match the naive
    // rank over the non-null subset
    val first = Windows.frank(df, ord, tie, "first", Nil, "rk",
      appearance = Seq(col("id").asc))
    val firstNaive = Windows.frank(df, ord, tie, "first", Nil, "rk",
      appearance = Seq(col("id").asc), allowGlobal = true)
    def mf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("rk").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mf(first) == mf(firstNaive))
    val kept = GlobalOrdered.frank(df, col("c1"), desc = false, "min",
      naLast = "keep", "rk", more = Seq((col("c2"), true)))
    val keptRows = kept.select(col("id"), col("c2"), col("rk")).collect()
    assert(keptRows.filter(_.isNullAt(1)).forall(_.isNullAt(2)))
    val survivors = keptRows.filterNot(_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val naiveKept = Windows.frank(df.filter(col("c2").isNotNull), ord, tie,
      "min", Nil, "rk", allowGlobal = true)
      .select(col("id"), col("rk").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(survivors == naiveKept)
  }

  test("DT let(...) is the functional := multi-assign, word for word (NEWS 1.15 #3795)") {
    val d = DT(spark.range(0, 5).toDF("a"))
    val viaLet = d.let("b" -> (col("a") * 2), "c" -> lit("x")).df
      .orderBy(col("a")).collect().map(_.toSeq).toSeq
    val viaSet = d.set("b" -> (col("a") * 2), "c" -> lit("x")).df
      .orderBy(col("a")).collect().map(_.toSeq).toSeq
    assert(viaLet == viaSet && viaLet.head.size == 3)
  }

  test("dcast margin/complete forms cap the collected pivot domain") {
    // the plain dcast delegates to Spark's pivot (its own 10k cap); the
    // margin/complete/subset forms collect the domain driver-side and
    // must refuse a high-cardinality pivot column with guidance instead
    // of OOMing the driver at scale
    val df = spark.range(0, Reshape.MAX_PIVOT + 5).select(
      (col("id") % 3).cast("string").as("g"),
      col("id").cast("string").as("rhs"), lit(1.0).as("v"))
    val e = intercept[IllegalArgumentException] {
      Reshape.dcastMargins(df, "g", "rhs", "v", c => sum(c))
    }
    assert(e.getMessage.contains("values="))
    // an explicit domain still works
    val ok = Reshape.dcastMargins(df, "g", "rhs", "v", c => sum(c),
      values = Seq("1", "2"))
    assert(ok.columns.contains("(all)"))
  }

  // ---- bench prev-artifact parsing + regression gate ------------------

  test("parsePrevArtifact reads warm values, sf, and contamination; rejects junk") {
    val clean = """{"metric":"total","value":30.0,"unit":"sec","n_queries":2,
      "queries":{"q_a":{"cold":0.5,"warm":0.101},"q_b":{"cold":1.0,"warm":-1.000,"noisy":true},
      "q_c":{"warm":0.034,"cold":0.1}},"sf":"/root/testdata/sf0.1"}"""
    val (sf, cont, warm) = Bench.parsePrevArtifact(clean).get
    assert(sf == "/root/testdata/sf0.1" && !cont)
    // failed entries (-1) are dropped; field order inside an entry is free
    assert(warm == Map("q_a" -> 0.101, "q_c" -> 0.034))

    val contaminated =
      """{"load_contaminated":true,"queries":{"q_a":{"cold":1.0,"warm":0.2}},"sf":"x"}"""
    assert(Bench.parsePrevArtifact(contaminated).exists(_._2))

    assert(Bench.parsePrevArtifact("not json").isEmpty)
    assert(Bench.parsePrevArtifact("""{"sf":"x"}""").isEmpty)
  }

  test("vsPrevRegressed: clean sweeps gate the median, loaded sweeps gate the min") {
    // clean: median 2x+ prev -> flagged; min is ignored
    assert(Bench.vsPrevRegressed(med = 0.5, minRep = 0.1, prev = 0.2,
      loadContaminated = false))
    assert(!Bench.vsPrevRegressed(med = 0.3, minRep = 0.3, prev = 0.2,
      loadContaminated = false))
    // loaded, planted slowdown: all 5 reps (incl. the min) carry a real
    // 4x regression that load cannot explain -> flagged despite the load
    assert(Bench.vsPrevRegressed(med = 1.2, minRep = 0.8, prev = 0.2,
      loadContaminated = true))
    // loaded, pure external noise: median inflated but the min landed
    // near prev -> NOT flagged (the old blind spot, now like-vs-like)
    assert(!Bench.vsPrevRegressed(med = 1.2, minRep = 0.25, prev = 0.2,
      loadContaminated = true))
    // sub-50ms values stay ungated in both modes
    assert(!Bench.vsPrevRegressed(med = 0.04, minRep = 0.04, prev = 0.01,
      loadContaminated = false))
    assert(!Bench.vsPrevRegressed(med = 0.04, minRep = 0.04, prev = 0.01,
      loadContaminated = true))
  }
}
