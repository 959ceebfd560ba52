package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StrictTypes

/** Opt-in strict type discipline mirroring the reference's errors
  * (R/bmerge.R:93-160 join matrix; src/fifelse.c:11,52,238,267 branch
  * types) — round-3 item 5. Negative battery: each case quotes a
  * combination the reference rejects in tests.Rraw.
  */
class StrictTypesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def num = Seq((1, 1.5, "a", true)).toDF("i", "d", "s", "b")

  // ---- join matrix -----------------------------------------------------

  test("strict join: string key vs numeric key errors (bmerge.R:109)") {
    val x = Seq((1, "x")).toDF("k", "vx")
    val i = Seq(("1", "y")).toDF("k", "vy")
    val e = intercept[IllegalArgumentException] {
      DT(x).join(DT(i), Seq("k"), strict = true)
    }
    assert(e.getMessage.contains("Incompatible join types"))
  }

  test("strict join: boolean key vs numeric key errors") {
    val x = Seq((true, "x")).toDF("k", "vx")
    val i = Seq((1, "y")).toDF("k", "vy")
    assert(intercept[IllegalArgumentException] {
      DT(x).join(DT(i), Seq("k"), strict = true)
    }.getMessage.contains("Incompatible join types"))
  }

  test("strict join: timestamp key vs numeric key errors") {
    val x = Seq(Tuple1(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))).toDF("k")
    val i = Seq(Tuple1(1L)).toDF("k")
    assert(intercept[IllegalArgumentException] {
      DT(x).join(DT(i), Seq("k"), strict = true)
    }.getMessage.contains("Incompatible join types"))
  }

  test("strict join: integer vs double is ALLOWED (reference coerces)") {
    val x = Seq((1, "x")).toDF("k", "vx")
    val i = Seq((1.0, "y")).toDF("k", "vy")
    assert(DT(x).join(DT(i), Seq("k"), strict = true).df.count() == 1)
  }

  test("strict join: same types always pass; non-strict never throws") {
    val x = Seq((1, "x")).toDF("k", "vx")
    val iS = Seq(("1", "y")).toDF("k", "vy")
    assert(DT(x).join(DT(x.withColumnRenamed("vx", "vy")), Seq("k"), strict = true)
      .df.count() == 1)
    // default (strict=false) keeps Catalyst's coercion — no error
    assert(DT(x).join(DT(iS), Seq("k")).df.count() == 1)
  }

  test("checkJoinTypePairs covers differently-named keys") {
    val x = Seq((1, "x")).toDF("xk", "vx")
    val i = Seq(("1", "y")).toDF("ik", "vy")
    assert(intercept[IllegalArgumentException] {
      StrictTypes.checkJoinTypePairs(x, i, Seq(("xk", "ik")))
    }.getMessage.contains("Incompatible join types"))
  }

  // ---- fifelse ---------------------------------------------------------

  test("fifelseStrict: non-boolean test errors (fifelse.c:11)") {
    assert(intercept[IllegalArgumentException] {
      StrictTypes.fifelseStrict(num, $"i", lit(1), lit(2))
    }.getMessage.contains("'test' must be logical"))
  }

  test("fifelseStrict: int yes vs double no PROMOTES to double (fifelse.c:40-58, tests.Rraw 2188.01)") {
    // round-20 correction: the reference coerces INTSXP up to REALSXP
    // here (the error at fifelse.c:50 fires only for non-promotable
    // mixes) — the earlier spec row encoded the error wrongly
    val out = num.select(
      StrictTypes.fifelseStrict(num, $"b", lit(1), lit(2.5)).as("r"))
    assert(out.schema("r").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.as[Double].collect().toSeq == Seq(1.0))
  }

  test("fifelseStrict: string yes vs int no errors") {
    assert(intercept[IllegalArgumentException] {
      StrictTypes.fifelseStrict(num, $"b", lit("x"), lit(2))
    }.getMessage.contains("same type"))
  }

  test("fifelseStrict: typed na must match (fifelse.c:58)") {
    assert(intercept[IllegalArgumentException] {
      StrictTypes.fifelseStrict(num, $"b", lit(1), lit(2), na = lit("oops"))
    }.getMessage.contains("same type"))
  }

  test("fifelseStrict: matching types evaluate like fifelse") {
    val out = num.select(
      StrictTypes.fifelseStrict(num, $"b", lit(10), lit(20), na = lit(-1)).as("r"))
      .as[Int].collect().toSeq
    assert(out == Seq(10))
  }

  // ---- fcase -----------------------------------------------------------

  test("fcaseStrict: non-boolean condition errors with its position (fifelse.c:238)") {
    val e = intercept[IllegalArgumentException] {
      StrictTypes.fcaseStrict(num, Seq($"b" -> lit(1), $"i" -> lit(2)))
    }
    assert(e.getMessage.contains("Argument #3 must be logical"))
  }

  test("fcaseStrict: mixed branch value types error (fifelse.c:267)") {
    assert(intercept[IllegalArgumentException] {
      StrictTypes.fcaseStrict(num, Seq($"b" -> lit(1), ($"i" === 1) -> lit("x")))
    }.getMessage.contains("same type"))
  }

  test("fcaseStrict: typed default must match the branch type") {
    assert(intercept[IllegalArgumentException] {
      StrictTypes.fcaseStrict(num, Seq($"b" -> lit(1)), default = lit(0.5))
    }.getMessage.contains("same type"))
  }

  test("fcaseStrict: consistent types evaluate like fcase") {
    val out = num.select(StrictTypes.fcaseStrict(num,
      Seq(($"i" === 2) -> lit("two"), $"b" -> lit("bool")),
      default = lit("none")).as("r")).as[String].collect().toSeq
    assert(out == Seq("bool"))
  }
}
