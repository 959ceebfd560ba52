package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** groupingsets over computed expressions + label= fill
  * (R/groupingsets.R:41-44,91-111; round-3 item 3).
  */
class GroupingSetsExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = Seq(
    ("a", 1, 10.0), ("a", 1, 20.0), ("a", 2, 30.0),
    ("b", 1, 40.0), ("b", 2, 50.0)).toDF("g", "k", "v")

  test("expression keys with totals-row labels") {
    val out = DT(base).groupingSetsAgg(
      Seq("gu" -> upper($"g"), "k2" -> ($"k" * 2)),
      Seq(Seq("gu", "k2"), Seq("gu"), Seq.empty),
      Seq(sum($"v").as("s")),
      labels = Map("gu" -> lit("ALL"), "k2" -> lit(-1)))
      .df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(out == Set(
      ("A", 2, 30.0), ("A", 4, 30.0), ("B", 2, 40.0), ("B", 4, 50.0), // detail
      ("A", -1, 60.0), ("B", -1, 90.0),                               // per-gu
      ("ALL", -1, 150.0)))                                            // grand total
  }

  test("unlabeled rolled-up keys stay null (SQL default)") {
    val out = DT(base).groupingSetsAgg(
      Seq("gu" -> upper($"g")),
      Seq(Seq("gu"), Seq.empty),
      Seq(count(lit(1)).as("n")))
      .df.collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(out == Set((Some("A"), 3L), (Some("B"), 2L), (None, 5L)))
  }

  test("key name colliding with an input column still works") {
    val out = DT(base).groupingSetsAgg(
      Seq("g" -> upper($"g")),
      Seq(Seq("g"), Seq.empty),
      Seq(sum($"v").as("s")),
      labels = Map("g" -> lit("TOT")))
      .df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("A", 60.0), ("B", 90.0), ("TOT", 150.0)))
  }

  test("sets referencing unknown key names are rejected") {
    intercept[IllegalArgumentException] {
      DT(base).groupingSetsAgg(Seq("gu" -> upper($"g")),
        Seq(Seq("nope")), Seq(count(lit(1)).as("n")))
    }
  }
}
