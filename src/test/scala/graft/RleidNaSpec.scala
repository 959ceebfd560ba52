package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

/** rleid NA-run parity with the reference (src/rleid.c): consecutive NAs
  * are ONE run, and ids start at 1 even when the first value is NA (the
  * lag-based form scored the first row 0 before this was pinned).
  */
class RleidNaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("leading NA run opens run 1; NA-NA continues a run; NA↔value breaks it") {
    val df = Seq((1, None: Option[String]), (2, None), (3, Some("a")),
      (4, Some("a")), (5, None), (6, Some("a")))
      .toDF("o", "v")
    val out = Windows.rleid(df, Seq("v"), Seq($"o".asc), Nil, "rid", allowGlobal = true)
      .orderBy($"o").select($"rid").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L, 2L, 2L, 3L, 4L))
  }

  test("per-group: every group's first row opens run 1, NA or not") {
    val df = Seq(("g1", 1, None: Option[Int]), ("g1", 2, Some(7)),
      ("g2", 1, Some(7)), ("g2", 2, None), ("g2", 3, None))
      .toDF("g", "o", "v")
    val out = Windows.rleid(df, Seq("v"), Seq($"o".asc), Seq("g"), "rid")
      .orderBy($"g", $"o").select($"rid").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 1L, 2L, 2L))
  }
}

/** Cumulative-fn NA parity: base-R cumsum/cummin/cummax propagate NA from
  * the first NA onward; naRm=true restores SQL skip-NULL semantics.
  */
class CumNaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df = Seq((1, Some(2.0)), (2, None: Option[Double]), (3, Some(5.0)))
    .toDF("o", "v")

  test("cumsum poisons from the first NA onward by default") {
    val out = df.withColumn("cs",
        Windows.cum("sum", $"v", Nil, Seq($"o".asc), allowGlobal = true))
      .orderBy($"o").select($"cs").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(2.0), None, None))
  }

  test("naRm=true skips NULLs like SQL running sum") {
    val out = df.withColumn("cs",
        Windows.cum("sum", $"v", Nil, Seq($"o".asc), allowGlobal = true, naRm = true))
      .orderBy($"o").select($"cs").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(2.0), Some(2.0), Some(7.0)))
  }

  test("cummin/cummax poison identically") {
    val outMin = df.withColumn("cm",
        Windows.cum("min", $"v", Nil, Seq($"o".asc), allowGlobal = true))
      .orderBy($"o").select($"cm").as[Option[Double]].collect().toSeq
    assert(outMin == Seq(Some(2.0), None, None))
    val outMax = df.withColumn("cm",
        Windows.cum("max", $"v", Nil, Seq($"o".asc), allowGlobal = true))
      .orderBy($"o").select($"cm").as[Option[Double]].collect().toSeq
    assert(outMax == Seq(Some(2.0), None, None))
  }
}

/** nafill(nan=NA) parity: NaN maps to null so const/locf fills see it. */
class NanAsNaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{lit, when}

  test("nanAsNa turns NaN into null; nafill then fills both") {
    val df = Seq((1, 1.0), (2, Double.NaN), (3, 3.0)).toDF("o", "v")
      .withColumn("v", when($"o" === 3, lit(null)).otherwise($"v"))
    val out = df.withColumn("f",
        graft.functions.Funcs.nafill(graft.functions.Funcs.nanAsNa($"v"), lit(-1.0)))
      .orderBy($"o").select($"f").as[Double].collect().toSeq
    assert(out == Seq(1.0, -1.0, -1.0))
  }

  test("locf carries past a NaN treated as missing") {
    val df = Seq((1, 5.0), (2, Double.NaN), (3, 7.0)).toDF("o", "v")
    val out = df.withColumn("f", graft.operators.Windows.nafillLocf(
        graft.functions.Funcs.nanAsNa($"v"), Nil, Seq($"o".asc), allowGlobal = true))
      .orderBy($"o").select($"f").as[Double].collect().toSeq
    assert(out == Seq(5.0, 5.0, 7.0))
  }
}

/** R head/tail with negative n (all-but-last / all-but-first) under the
  * explicit-order doctrine.
  */
class HeadTailNegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def dt = DT(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))
    .toDF("o", "v"))
  private def vals(d: DT): Seq[String] =
    d.df.orderBy(col("o")).select(col("v")).as[String].collect().toSeq

  test("head(-2) drops the last 2; tail(-2) drops the first 2") {
    assert(vals(dt.headOrdered(-2, Seq(col("o").asc))) == Seq("a", "b", "c"))
    assert(vals(dt.tailOrdered(-2, Seq(col("o").asc))) == Seq("c", "d", "e"))
  }

  test("positive forms agree with limit/offset; overshoot clamps") {
    assert(vals(dt.headOrdered(2, Seq(col("o").asc))) == Seq("a", "b"))
    assert(vals(dt.tailOrdered(2, Seq(col("o").asc))) == Seq("d", "e"))
    assert(vals(dt.headOrdered(-9, Seq(col("o").asc))) == Seq.empty)
    assert(vals(dt.tailOrdered(9, Seq(col("o").asc))) == Seq("a", "b", "c", "d", "e"))
  }
}

/** setnafill multi-column pass: const with recycled/per-column fills,
  * ordered locf sharing one window sort.
  */
class SetnafillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit}

  private def dt = DT(Seq(
    (1, Some(1.0), Some(10.0)), (2, None: Option[Double], None: Option[Double]),
    (3, Some(3.0), None)).toDF("o", "a", "b"))

  test("const: one fill recycles over all columns; per-column list applies in order") {
    val r1 = dt.setnafill(Seq("a", "b"), "const", Seq(lit(-1.0)))
      .df.orderBy(col("o")).select(col("a"), col("b"))
      .as[(Double, Double)].collect().toSeq
    assert(r1 == Seq((1.0, 10.0), (-1.0, -1.0), (3.0, -1.0)))
    val r2 = dt.setnafill(Seq("a", "b"), "const", Seq(lit(-1.0), lit(-2.0)))
      .df.orderBy(col("o")).select(col("a"), col("b"))
      .as[(Double, Double)].collect().toSeq
    assert(r2 == Seq((1.0, 10.0), (-1.0, -2.0), (3.0, -2.0)))
  }

  test("locf fills both columns along the order") {
    val r = dt.setnafill(Seq("a", "b"), "locf", order = Seq(col("o").asc),
        allowGlobal = true)
      .df.orderBy(col("o")).select(col("a"), col("b"))
      .as[(Double, Double)].collect().toSeq
    assert(r == Seq((1.0, 10.0), (1.0, 10.0), (3.0, 10.0)))
  }

  test("mismatched fill count and bad type are refused") {
    intercept[IllegalArgumentException] {
      dt.setnafill(Seq("a", "b"), "const", Seq(lit(1), lit(2), lit(3)))
    }
    intercept[IllegalArgumentException] { dt.setnafill(Seq("a"), "nope") }
  }
}

/** setcolorder before=/after= anchored moves. */
class SetColOrderAtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dt = DT(Seq((1, 2, 3, 4)).toDF("a", "b", "c", "d"))

  test("before/after move preserves relative order of the moved block") {
    assert(dt.setColOrderAt(Seq("d", "b"), before = Some("a"))
      .df.columns.toSeq == Seq("d", "b", "a", "c"))
    assert(dt.setColOrderAt(Seq("a", "c"), after = Some("d"))
      .df.columns.toSeq == Seq("b", "d", "a", "c"))
  }

  test("error paths: both/neither anchors, moving the anchor") {
    intercept[IllegalArgumentException] { dt.setColOrderAt(Seq("a")) }
    intercept[IllegalArgumentException] {
      dt.setColOrderAt(Seq("a"), before = Some("b"), after = Some("c")) }
    intercept[IllegalArgumentException] {
      dt.setColOrderAt(Seq("a"), before = Some("a")) }
  }
}

/** .GRP: NA group keys are groups; counter follows sorted key order. */
class GrpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("NA group gets its own counter (nulls first in sort order)") {
    val df = Seq((1, Some("b")), (2, None: Option[String]), (3, Some("a")),
      (4, None), (5, Some("b"))).toDF("o", "g")
    val out = graft.operators.Windows.grp(df, Seq("g"))
      .orderBy(col("o")).select(col("grp")).as[Int].collect().toSeq
    // sorted groups: null(1) < "a"(2) < "b"(3)
    assert(out == Seq(3, 1, 2, 1, 3))
  }
}
