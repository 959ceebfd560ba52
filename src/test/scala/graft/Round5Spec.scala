package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Funcs
import graft.operators.{Joins, Reshape, Scale, Windows}

/** Round-5 hardening: skew-safe as-of tier, approx-quantile tier, dedup
  * cache eviction, cube margins, measure(pattern=), adaptive frollapply,
  * tables() metadata, seeded random ranks.
  */
class Round5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- asofSalted ≡ asof on a skewed fixture ---------------------------

  /** Hot key "h" with 300 x rows (incl. nulls in the value column, some
    * at bucket boundaries), a cold key, a probe-only key, and probes
    * before the first x row — every carry edge case in one fixture.
    */
  private lazy val asofX = (1 to 300).map { i =>
    ("h", i.toDouble, if (i % 17 == 0) None else Some(i * 1.0))
  }.concat(Seq(("c", 5.0, Some(50.0)), ("c", 25.0, None), ("c", 40.0, Some(400.0)),
      (null.asInstanceOf[String], 1.0, Some(-1.0))))
    .toDF("k", "t", "v")
  private lazy val asofI = ((1 to 300 by 7).map(i => ("h", i + 0.5, i.toLong)) ++
    Seq(("h", 0.2, 9001L), ("c", 4.0, 9002L), ("c", 30.0, 9003L),
      ("c", 999.0, 9004L), ("p", 12.0, 9005L),
      // null by key: a real window group — must carry across buckets too
      (null.asInstanceOf[String], 100.0, 9006L)))
    .toDF("k", "t", "pid")

  private def collected(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Double])] =
    df.select(col("pid"), col("v")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1).toSeq

  test("asofSalted(Locf) equals asof(Locf) on a skewed fixture, any bucket width") {
    val plain = collected(Joins.asof(asofX, asofI, Seq("k"), "t", Joins.Locf, Seq("v")))
    for (w <- Seq(1.0, 10.0, 37.0, 1000.0)) {
      val salted = collected(
        Joins.asofSalted(asofX, asofI, Seq("k"), "t", Joins.Locf, w, Seq("v")))
      assert(salted == plain, s"bucketWidth=$w diverged from asof")
    }
    // sanity: the fixture exercises real fills, empty-prefix nulls, and
    // null-value carry-over
    assert(plain.exists(_._2.nonEmpty) && plain.exists(_._2.isEmpty))
  }

  test("asofSalted(Limit) equals asof(Limit) on the same fixture") {
    val plain = collected(
      Joins.asof(asofX, asofI, Seq("k"), "t", Joins.Limit(3.0), Seq("v")))
    for (w <- Seq(2.0, 10.0)) {
      val salted = collected(
        Joins.asofSalted(asofX, asofI, Seq("k"), "t", Joins.Limit(3.0), w, Seq("v")))
      assert(salted == plain, s"Limit bucketWidth=$w diverged from asof")
    }
  }

  test("asofSalted(Nocb) and asofSalted(Nearest) equal asof on the same fixture") {
    for (roll <- Seq(Joins.Nocb, Joins.Nearest)) {
      val plain = collected(Joins.asof(asofX, asofI, Seq("k"), "t", roll, Seq("v")))
      for (w <- Seq(1.0, 10.0, 1000.0)) {
        val salted = collected(
          Joins.asofSalted(asofX, asofI, Seq("k"), "t", roll, w, Seq("v")))
        assert(salted == plain, s"$roll bucketWidth=$w diverged from asof")
      }
    }
  }

  test("asofSalted carries values from x rows whose `on` is null (sort-first in asof)") {
    val x = Seq(("k", Option.empty[Double], Some(7.0)), ("k", Some(50.0), Some(9.0)))
      .toDF("k", "t", "v")
    val i = Seq(("k", Some(5.0), 1L), ("k", Some(60.0), 2L), ("k", Option.empty[Double], 3L))
      .toDF("k", "t", "pid")
    for (roll <- Seq[Joins.Roll](Joins.Locf, Joins.Nocb, Joins.Nearest)) {
      val plain = collected(Joins.asof(x, i, Seq("k"), "t", roll, Seq("v")))
      val salted = collected(Joins.asofSalted(x, i, Seq("k"), "t", roll, 10.0, Seq("v")))
      assert(salted == plain, s"$roll diverged on null-`on` x rows")
    }
    // the null-`on` reference must actually reach the early probe
    val locf = collected(Joins.asofSalted(x, i, Seq("k"), "t", Joins.Locf, 10.0, Seq("v")))
    assert(locf.toMap.apply(1L) == Some(7.0))
  }

  test("asofSalted rejects bad widths") {
    intercept[IllegalArgumentException] {
      Joins.asofSalted(asofX, asofI, Seq("k"), "t", Joins.Locf, 0.0, Seq("v"))
    }
  }

  // ---- Dedup.clearBases ------------------------------------------------

  test("clearBases unpersists the memoized shingle/signature bases") {
    graft.dedup.Dedup.clearBases()
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = (0 until 40).map(i =>
      (i.toLong, s"shared boilerplate prefix ${i % 5} tail $i words here"))
      .toDF("doc_id", "text")
    graft.dedup.Dedup.minhashPairsPortable(docs, "doc_id", "text").count()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "portable pipeline should have registered a persisted base")
    graft.dedup.Dedup.clearBases()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "clearBases() must unpersist every registered base")
  }

  test("clearBases(df) evicts only that corpus's base (+its memoized pairs)") {
    graft.dedup.Dedup.clearBases()
    val base = spark.sparkContext.getPersistentRDDs.size
    val a = (0 until 20).map(i => (i.toLong, s"corpus a doc $i")).toDF("doc_id", "text")
    val b = (0 until 20).map(i => (i.toLong, s"corpus b doc $i")).toDF("doc_id", "text")
    graft.dedup.Dedup.minhashPairsPortable(a, "doc_id", "text").count()
    graft.dedup.Dedup.minhashPairsPortable(b, "doc_id", "text").count()
    // per corpus: the shingle/signature base AND the verified pair list
    assert(spark.sparkContext.getPersistentRDDs.size == base + 4)
    graft.dedup.Dedup.clearBases(Some(a))
    assert(spark.sparkContext.getPersistentRDDs.size == base + 2,
      "clearBases(a) must drop exactly a's base and pairs")
    graft.dedup.Dedup.clearBases()
    assert(spark.sparkContext.getPersistentRDDs.size == base)
  }

  // ---- approx-quantile tier --------------------------------------------

  test("quantileAgg(exact=false) stays within bounded rank error of exact") {
    val li = Tables.load(spark, SparkTestSession.sfDir, "lineitem")
    val both = li.groupBy(col("l_returnflag"))
      .agg(
        Funcs.quantileAgg(col("l_quantity"), 0.5).cast("double").as("ex"),
        Funcs.quantileAgg(col("l_quantity"), 0.5, exact = false).cast("double").as("ap"),
        Funcs.quantileAgg(col("l_quantity"), 0.9).cast("double").as("ex9"),
        Funcs.quantileAgg(col("l_quantity"), 0.9, exact = false).cast("double").as("ap9"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"median approx ${r.getDouble(2)} vs exact ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) <= 1.0,
        s"p90 approx ${r.getDouble(4)} vs exact ${r.getDouble(3)}")
    }
  }

  // ---- melt measure(pattern=) ------------------------------------------

  test("meltMeasurePattern splits names by capture groups; missing combos null") {
    val wide = Seq((1, 10.0, 20.0, 0.1)).toDF("id", "a_y1", "a_y2", "b_y1")
    val long = Reshape.meltMeasurePattern(wide, Seq("id"), "^([ab])_y(\\d+)$")
    assert(long.columns.toSeq == Seq("id", "dim", "a", "b"))
    val rows = long.orderBy("dim").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "1" && rows(0).getDouble(2) == 10.0 &&
      rows(0).getDouble(3) == 0.1)
    assert(rows(1).getString(1) == "2" && rows(1).getDouble(2) == 20.0 &&
      rows(1).isNullAt(3), "b_y2 is absent → null")
    // non-matching columns are ignored, bad patterns rejected
    intercept[IllegalArgumentException] {
      Reshape.meltMeasurePattern(wide, Seq("id"), "^nope$")
    }
    intercept[IllegalArgumentException] {
      Reshape.meltMeasurePattern(wide, Seq("id"), "^(a)_y\\d+$") // 1 group
    }
    // unanchored pattern parsing two columns into one slot must fail
    // loudly instead of silently dropping a column's data
    val clash = Seq((1, 1.0, 2.0)).toDF("id", "a_y1", "xa_y1")
    intercept[IllegalArgumentException] {
      Reshape.meltMeasurePattern(clash, Seq("id"), "(a)_y(\\d+)")
    }
  }

  test("meltMeasureN: value.name group at any position + multi-dim single-value form") {
    // multi-value form, value.name group SECOND (reference allows any slot)
    val wide = Seq((1, 10.0, 20.0, 0.1, 0.2))
      .toDF("id", "r1_a", "r2_a", "r1_b", "r2_b")
    val long = Reshape.meltMeasureN(wide, Seq("id"), "^(r\\d)_([ab])$",
      Seq("region", "value.name"))
    assert(long.columns.toSeq == Seq("id", "region", "a", "b"))
    val rows = long.orderBy("region").collect()
    assert(rows.map(r => (r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq ==
      Seq(("r1", 10.0, 0.1), ("r2", 20.0, 0.2)))

    // single-value form with mixed types promotes (int + double → double)
    val mixed = Seq((1, 5, 2.5)).toDF("id", "m_x", "m_y")
    val single = Reshape.meltMeasureN(mixed, Seq("id"), "^m_([xy])$", Seq("k"))
    assert(single.columns.toSeq == Seq("id", "k", "value"))
    assert(single.schema("value").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(single.orderBy("k").collect().map(_.getDouble(2)).toSeq == Seq(5.0, 2.5))

    intercept[IllegalArgumentException] { // group-name count mismatch
      Reshape.meltMeasureN(wide, Seq("id"), "^(r\\d)_([ab])$", Seq("region"))
    }
  }

  // ---- dcast cube margins ----------------------------------------------

  test("dcastMarginsCube emits all 2^k margin blocks with consistent totals") {
    val d = Seq(
      ("en", "web", "long", 10L), ("en", "web", "short", 1L),
      ("en", "book", "long", 100L), ("de", "web", "short", 1000L))
      .toDF("lang", "source", "b", "n")
    val cube = Reshape.dcastMarginsCube(d, Seq("lang", "source"), "b", "n",
      c => sum(c).cast("bigint"), values = Seq("long", "short"))
    val rows = cube.collect().map(r => ((r.getString(0), r.getString(1)),
      (Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    // 4 blocks: (lang,source)=3 rows, (lang)=2, (source)=2, ()=1
    assert(rows.size == 8)
    assert(rows(("(all)", "(all)")) == (Some(110L), Some(1001L), 1111L))
    assert(rows(("(all)", "web")) == (Some(10L), Some(1001L), 1011L),
      "the (source)-only block is the one rollup margins cannot express")
    assert(rows(("en", "(all)")) == (Some(110L), Some(1L), 111L))
    assert(rows(("de", "web")) == (None, Some(1000L), 1000L))
  }

  // ---- adaptive frollapply ---------------------------------------------

  test("frollApplyAdaptive frame folds match frollAdaptive; short prefix → null") {
    val df = Seq(
      (1, 1, 10.0, 2), (1, 2, 20.0, 1), (1, 3, 30.0, 3), (1, 4, 40.0, 4),
      (2, 1, 5.0, 1), (2, 2, Double.NaN, 2))
      .toDF("g", "seq", "v", "an")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val ord = Seq(col("seq").asc)
    val arr = Windows.frollApplyAdaptive(col("v"), col("an"), 4, Seq("g"), ord)
    val out = df
      .withColumn("folded", aggregate(arr, lit(0.0), (a, x) => a + x))
      .withColumn("builtin",
        Windows.frollAdaptive("sum", col("v"), col("an"), 4, Seq("g"), ord))
      .orderBy("g", "seq").collect()
    out.foreach { r =>
      val folded = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      val builtin = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      assert(folded == builtin, s"row ${r.getInt(0)}/${r.getInt(1)}")
    }
    // g=1 seq=3 an=3: frame (10,20,30) → 60; seq=4 an=4 → 100
    assert(out(2).getDouble(4) == 60.0 && out(3).getDouble(4) == 100.0)
    // g=2 seq=2: null v inside the slice nulls a plain (na.rm=FALSE) fold
    assert(out(5).isNullAt(4))
    // g=2 seq=1 an=1 → just itself
    assert(out(4).getDouble(4) == 5.0)
  }

  // ---- tables() metadata -----------------------------------------------

  test("tables() reports ncol/cols/key/indices, with counts opt-in") {
    Scale.clearIndexes()
    val ordersDf = Tables.load(spark, SparkTestSession.sfDir, "orders")
    val keyed = DT(ordersDf).keyBy("o_custkey")
    DT.register("t_orders", keyed)
    val region = Tables.load(spark, SparkTestSession.sfDir, "region")
    Scale.setIndex(region, Seq("r_name"))
    DT.register("t_region", DT(region))
    try {
      val t = DT.tables(spark).collect().map(r => r.getString(0) -> r).toMap
      val o = t("t_orders")
      assert(o.isNullAt(1), "nrow must be null without counts=true")
      assert(o.getInt(2) == ordersDf.columns.length)
      assert(o.getString(4) == "o_custkey")
      val rg = t("t_region")
      assert(rg.getString(5) == "r_name", "setIndex must surface in INDICES")
      assert(rg.isNullAt(4), "unkeyed table has null KEY")

      val counted = DT.tables(spark, counts = true).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(counted("t_region").getLong(1) == region.count())
    } finally {
      DT.unregister(spark, "t_orders"); DT.unregister(spark, "t_region")
      Scale.clearIndexes()
    }
  }

  // ---- RoundMantissa ≡ dtwiddle grouping --------------------------------

  /** Behavioral model of the reference's rounded sort key (dtwiddle,
    * src/forder.c:425-440): flip to the monotone encoding (sign bit
    * always; all bits when negative), add the granule when the top
    * dropped bit is set, shift the dropped bytes off. Two doubles get
    * the same data.table rounded-comparison class iff these keys match.
    */
  private def dtwiddleModel(x: Double, bytes: Int): Long = {
    var u = java.lang.Double.doubleToRawLongBits(if (x == 0.0) 0.0 else x)
    u ^= (if (u < 0) -1L else Long.MinValue)
    u += (u & (1L << (8 * bytes - 1))) << 1
    u >>> (8 * bytes)
  }

  test("RoundMantissa groups exactly like dtwiddle, negative ties included") {
    val bytes = 2
    val g = 1L << (8 * bytes)
    // adversarial set: exact half-granule ties both signs, boundary ±1,
    // zero straddle, plus pseudo-random doubles
    val base = Seq(1.0, -1.0, math.Pi, -math.Pi, 1e300, -1e300, 1e-300, -1e-300)
    val crafted = base.flatMap { v =>
      val b = java.lang.Double.doubleToRawLongBits(v)
      val q = b & ~(g - 1)
      Seq(q, q + g / 2 - 1, q + g / 2, q + g / 2 + 1, q + g - 1)
        .map(java.lang.Double.longBitsToDouble)
    } ++ (0 until 80).map { i =>
      java.lang.Double.longBitsToDouble(
        scala.util.hashing.MurmurHash3.stringHash(s"seed$i").toLong * 2654435761L)
    }.filter(d => !d.isNaN && !d.isInfinite) ++
      Seq(0.0, -0.0, java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE)
    val pairs = crafted.combinations(2).toSeq ++ crafted.map(v => Seq(v, v))
    val df = pairs.map { case Seq(a, b) => (a, b) }.toDF("a", "b")
      .withColumn("ra", graft.plans.RoundMantissa(col("a"), bytes))
      .withColumn("rb", graft.plans.RoundMantissa(col("b"), bytes))
    val rows = df.collect()
    rows.foreach { r =>
      val (a, b) = (r.getDouble(0), r.getDouble(1))
      val ours = r.getDouble(2) == r.getDouble(3)
      val ref = dtwiddleModel(a, bytes) == dtwiddleModel(b, bytes)
      assert(ours == ref, s"a=$a b=$b ours=$ours dtwiddle=$ref")
    }
  }

  // ---- frank ties="random" seeded tier ---------------------------------

  test("frank random ties: seeded rand is seed-stable; default is content-stable") {
    val df = Seq((1, "x"), (1, "y"), (1, "z"), (2, "w"), (2, "v"))
      .toDF("score", "id")
    def ranks(seed: Option[Long]) =
      Windows.frank(df, Seq(col("score").asc), Seq(col("score")), "random",
        Nil, "rk", allowGlobal = true, randomSeed = seed)
        .select("id", "rk").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val s1 = ranks(Some(42L)); val s2 = ranks(Some(42L))
    assert(s1 == s2, "same seed must reproduce the same tiebreak")
    val h1 = ranks(None); val h2 = ranks(None)
    assert(h1 == h2, "row-hash tier is deterministic")
    // both are valid permutations: rank sets per tie block preserved
    assert(s1.values.toSeq.sorted == Seq(1, 2, 3, 4, 5))
    assert(h1.values.toSeq.sorted == Seq(1, 2, 3, 4, 5))
  }
}
