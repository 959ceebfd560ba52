package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Joins, Reshape}

/** Round-19 reference-tranche tests (VERDICT r18 "Next round" #5): the
  * interaction corners the reference sweeps with its hand-built corpus,
  * ported as numbered rows — foverlaps type boundary ties (tests.Rraw
  * 1372 battery; src/ijoin.c overlap enums), roll distance boundaries
  * (src/bmerge.c:13-17), dcast multi-fun × drop=FALSE × fill
  * (R/fcast.R:126; tests.Rraw 1102.04/.32/.33), and measure() multi-
  * group na.rm corners (R/fmelt.R; tests.Rraw 1035.014/.0184/.0186).
  */
class Round19RefSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- foverlaps boundary ties across all five types -------------------
  // x = the probe side (the reference's i), y = the lookup side (the
  // reference's x); engine typ semantics must equal ijoin.c's enums on
  // inclusive-bound integer intervals, including point intervals and
  // single-point touching.

  private def xProbe = Seq(
    (1, 1, 5), (2, 2, 4), (3, 5, 5), (4, 6, 8), (5, 2, 8), (6, 13, 14))
    .map { case (id, s, e) => ("a", id, s, e) }
    .toDF("k", "xid", "xs", "xe")
  private def yLook = Seq(
    (1, 2, 8), (2, 5, 5), (3, 5, 9), (4, 2, 4), (5, 10, 12))
    .map { case (id, s, e) => ("a", id, s, e) }
    .toDF("k", "yid", "ys", "ye")

  private def pairs(typ: String): Set[(Int, Int)] =
    Joins.overlap(xProbe, yLook, Seq("k"), "xs", "xe", "ys", "ye", typ)
      .select("xid", "yid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private def pairsBinned(typ: String, w: Long): Set[(Int, Int)] =
    Joins.overlapBinned(xProbe, yLook, Seq("k"), "xs", "xe", "ys", "ye", w, typ)
      .select("xid", "yid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private val expectAny = Set(
    1 -> 1, 1 -> 2, 1 -> 3, 1 -> 4,
    2 -> 1, 2 -> 4,
    3 -> 1, 3 -> 2, 3 -> 3,
    4 -> 1, 4 -> 3,
    5 -> 1, 5 -> 2, 5 -> 3, 5 -> 4)
  private val expectWithin = Set(
    2 -> 1, 2 -> 4, 3 -> 1, 3 -> 2, 3 -> 3, 4 -> 1, 4 -> 3, 5 -> 1)
  private val expectStart = Set(2 -> 1, 2 -> 4, 5 -> 1, 5 -> 4, 3 -> 2, 3 -> 3)
  private val expectEnd = Set(2 -> 4, 4 -> 1, 5 -> 1, 3 -> 2, 1 -> 2)
  private val expectEqual = Set(2 -> 4, 3 -> 2, 5 -> 1)

  test("r19ref.1372a foverlaps type=any: point intervals + single-point touch match inclusively") {
    assert(pairs("any") == expectAny)
  }
  test("r19ref.1372b foverlaps type=within: probe-within-lookup direction, boundary-sharing included") {
    assert(pairs("within") == expectWithin)
  }
  test("r19ref.1372c foverlaps type=start/end: exact boundary equality only") {
    assert(pairs("start") == expectStart)
    assert(pairs("end") == expectEnd)
  }
  test("r19ref.1372d foverlaps type=equal: both bounds (incl. the point-interval pair)") {
    assert(pairs("equal") == expectEqual)
  }
  test("r19ref.1372e binned tier reproduces the equi tier on every type at several bin widths") {
    for (typ <- Seq("any", "within", "start", "end", "equal"); w <- Seq(1L, 3L, 7L))
      assert(pairsBinned(typ, w) == pairs(typ), s"type=$typ binWidth=$w")
  }
  test("r19ref.1372f foverlaps mult=first/last pick by (yStart, yEnd) within the match set") {
    def multPairs(mult: String): Set[(Int, Int)] =
      Joins.overlapMult(xProbe, yLook, Seq("k"),
          "xs", "xe", "ys", "ye", "any", mult)
        .select("xid", "yid").collect()
        .filterNot(_.isNullAt(1)) // a nomatch-extended probe row, if kept
        .map(r => (r.getInt(0), r.getInt(1))).toSet
    // x1's any-matches are y4[2,4], y1[2,8], y2[5,5], y3[5,9] → first=y4
    assert(multPairs("first") == Set(1 -> 4, 2 -> 4, 3 -> 1, 4 -> 1, 5 -> 4))
    assert(multPairs("last") == Set(1 -> 3, 2 -> 1, 3 -> 3, 4 -> 3, 5 -> 3))
  }

  // ---- roll distance boundary (src/bmerge.c:13-17) ----------------------

  test("r19ref.roll roll=<limit> is INCLUSIVE at exactly the limit distance") {
    val x = Seq(("g", 10.0, "v10")).toDF("k", "t", "v")
    val i = Seq(("g", 12.0, 1), ("g", 12.5, 2), ("g", 9.0, 3))
      .toDF("k", "t", "iid")
    val out = Joins.asof(x, i, Seq("k"), "t", Joins.Limit(2.0), Seq("v"))
      .select("iid", "v").collect().map(r =>
        (r.getInt(0), Option(r.getString(1)))).toMap
    assert(out(1) == Some("v10"), "gap == limit must match (inclusive)")
    assert(out(2) == None, "gap just past the limit must not match")
    assert(out(3) == None, "a forward-roll limit never matches backward")
  }

  // ---- melt measure() multi-group na.rm (R/fmelt.R) ---------------------

  test("r19ref.1035_014 meltMulti na.rm drops a combo row when ANY value column is NA") {
    val df = Seq((1.0, 1.0, 2.0)).toDF("a1", "b1", "b2")
    val out = Reshape.meltMulti(df, Nil,
        scala.collection.immutable.ListMap(
          "a" -> Seq("a1"), "b" -> Seq("b1", "b2")), naRm = true)
      .select("variable", "a", "b").collect().toSeq
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // variable level 2 has no a-column → a=NA → the whole row vanishes,
    // even though b2=2 is present (tests.Rraw 1035.014)
    assert(out == Seq((1, 1.0, 1.0)))
  }

  test("r19ref.1035_0184 meltMulti na.rm over staggered NA patterns keeps the diagonal") {
    val df = Seq(
      (Some(1.0), Option.empty[Double], Some(3.0), Option.empty[Double]),
      (Option.empty[Double], Some(2.0), Some(4.0), Some(5.0)))
      .toDF("l1", "l2", "n34", "na5")
    val out = Reshape.meltMulti(df, Nil,
        scala.collection.immutable.ListMap(
          "l" -> Seq("l1", "l2"), "n" -> Seq("n34", "na5")), naRm = true)
      .select("variable", "l", "n").collect().toSeq
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sorted
    // row1@var1 (l=1,n=3) and row2@var2 (l=2,n=5) survive; row2@var1
    // (l=NA,n=4) and row1@var2 (l=NA,n=NA) are removed
    assert(out == Seq((1, 1.0, 3.0), (2, 2.0, 5.0)))
  }

  test("r19ref.1035_0186 measure(sep=) na.rm: a dim level missing one group's column vanishes") {
    val df = Seq((1, Some(1.0), Option.empty[Double], 10.0, 20.0))
      .toDF("id", "a_1", "a_2", "b_1", "b_2")
    val out = Reshape.meltMeasureSepN(df, Seq("id"), "_",
        Seq("value.name", "dim"), naRm = true)
      .select("dim", "a", "b").collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out == Seq(("1", 1.0, 10.0)),
      "dim=2 has a=NA and must be removed by na.rm")
  }

  // ---- dcast multi-fun × drop=FALSE × fill (R/fcast.R:126) ---------------

  test("r19ref.1102_32 dcastMulti per-agg empty-cell fill: sum→0 next to mean→NaN") {
    val df = Seq((1, "b", 2.5), (1, "b", 1.5), (2, "a", 4.0))
      .toDF("x", "z", "d1")
    val out = Reshape.dcastMulti(df, Seq("x"), "z", Seq("a", "b"),
        Seq("d1_sum" -> sum(col("d1")), "d1_mean" -> avg(col("d1"))),
        fills = Map("d1_sum" -> lit(0.0), "d1_mean" -> lit(Double.NaN)))
      .orderBy("x").collect().toSeq.map(r => (r.getInt(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // columns: x, d1_sum_a, d1_mean_a, d1_sum_b, d1_mean_b? — positional
    // naming is (per value, per agg): a_sum, a_mean, b_sum, b_mean
    assert(out.size == 2)
    val r1 = out(0); val r2 = out(1)
    assert(r1._1 == 1 && r1._2 == 0.0 && r1._3.isNaN &&
      r1._4 == 4.0 && r1._5 == 2.0, r1.toString)
    assert(r2._1 == 2 && r2._2 == 4.0 && r2._3 == 4.0 &&
      r2._4 == 0.0 && r2._5.isNaN, r2.toString)
  }

  test("r19ref.1102_04 dcastComplete (drop=FALSE) fill lands in unobserved cells AND completion-only keys") {
    val df = Seq((1, 1, 0, 5.0), (1, 2, 2, 7.0), (2, 1, 0, 9.0))
      .toDF("diet", "chick", "time", "weight")
    val out = Reshape.dcastComplete(df, Seq("diet", "chick"), "time",
        "weight", sum(_), fill = Some(lit(0.0)))
      .orderBy("diet", "chick").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(out == Seq(
      (1, 1, 5.0, 0.0),   // observed key, unobserved time=2 cell → fill
      (1, 2, 0.0, 7.0),
      (2, 1, 9.0, 0.0),
      (2, 2, 0.0, 0.0)))  // completion-only key → every cell filled
  }

  test("r19ref.1102_33 dcastCompleteMulti: drop=FALSE × multi-fun × per-agg fill compose") {
    val df = Seq((1, 1, "p", 3.0), (2, 2, "q", 8.0)).toDF("x", "y", "z", "d")
    val out = Reshape.dcastCompleteMulti(df, Seq("x", "y"), "z",
        Seq("d_sum" -> sum(col("d")), "d_cnt" -> count(col("d"))),
        fills = Map("d_sum" -> lit(0.0), "d_cnt" -> lit(0L)))
      .orderBy("x", "y").collect().toSeq
    assert(out.size == 4, "drop=FALSE completes the 2×2 key domain")
    val byKey = out.map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(byKey((1, 1)) == ((3.0, 1L, 0.0, 0L)))
    assert(byKey((2, 2)) == ((0.0, 0L, 8.0, 1L)))
    // completion-only keys: every (value × agg) cell takes its agg's fill
    assert(byKey((1, 2)) == ((0.0, 0L, 0.0, 0L)))
    assert(byKey((2, 1)) == ((0.0, 0L, 0.0, 0L)))
  }

  test("r19ref.1102_32b unmapped aggs keep SQL NULL while mapped ones fill") {
    val df = Seq((1, "b", 2.0)).toDF("x", "z", "d1")
    val row = Reshape.dcastMulti(df, Seq("x"), "z", Seq("a", "b"),
        Seq("d1_sum" -> sum(col("d1")), "d1_max" -> max(col("d1"))),
        fills = Map("d1_sum" -> lit(0.0)))
      .collect()(0)
    // a_sum filled to 0.0; a_max stays null; b cells observed
    assert(row.getDouble(1) == 0.0 && row.isNullAt(2))
    assert(row.getDouble(3) == 2.0 && row.getDouble(4) == 2.0)
  }
}
