package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.StrictTypes
import graft.operators.{Reshape, Windows}

/** Round-20 reference-tranche tests (VERDICT r19 "Next round" #5): the
  * second edge-case port — fifelse's int↔double PROMOTION exception to
  * its otherwise-strict typing (src/fifelse.c:40-58; tests.Rraw
  * 2188.01/.02/.13/.16), fcase's strictness + reference error spelling
  * (src/fifelse.c:269,277; tests.Rraw 2127.21/.24), frank
  * ties="random" × na.last (R/frank.R:37-51,70-73; #4243; tests.Rraw
  * 1962.026/.027), shift fill Date↔POSIXct refusal (src/shift.c:43-47;
  * tests.Rraw 1463.81/.82), and rbindlist fill=TRUE × use.names=FALSE
  * positional binding with UNEQUAL column counts plus the
  * as.character-spelling of top-of-ladder string promotion
  * (src/rbindlist.c #5444; tests.Rraw 2003.3-.6).
  */
class Round20RefSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def testDf = Seq[(Integer, java.lang.Boolean)](
    (1, true), (2, false), (3, true), (4, null))
    .toDF("i", "t")
    .withColumn("yi", col("i"))          // int yes
    .withColumn("yd", col("i") * 1.0)    // double yes
    .withColumn("ni", col("i") + 10)     // int no
    .withColumn("nd", (col("i") + 10) * 1.0)

  // ---- 1. fifelse(test, 1L, 2L, 1.0) promotes ALL args to double ------
  test("ref 2188.01: fifelse int yes/no with double na promotes to double") {
    val out = testDf.select(StrictTypes.fifelseStrict(testDf, col("t"),
      col("yi"), col("ni"), lit(1.5)).as("v"))
    assert(out.schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(out.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ==
      Seq(1.0, 12.0, 3.0, 1.5))
  }

  // ---- 2. fifelse(test, 1, 2, 1L): int na promotes up ------------------
  test("ref 2188.02: fifelse double yes/no with int na promotes to double") {
    val out = testDf.select(StrictTypes.fifelseStrict(testDf, col("t"),
      col("yd"), col("nd"), lit(99)).as("v"))
    assert(out.schema("v").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(out.collect().map(r => r.getDouble(0)).toSeq ==
      Seq(1.0, 12.0, 3.0, 99.0))
  }

  // ---- 3. mixes OUTSIDE {int, double} still error ----------------------
  test("ref 2188.13: fifelse string na against numeric yes/no errors") {
    val e = intercept[IllegalArgumentException] {
      StrictTypes.fifelseStrict(testDf, col("t"), col("yi"), col("nd"),
        lit("a"))
    }
    assert(e.getMessage.contains("'na' is of type string") &&
      e.getMessage.contains("Please make all arguments have the same type."))
  }

  // ---- 4. null na is type-free (2188.16's NULL-na treated as NA) -------
  test("ref 2188.16: fifelse null na yields typed NA under NA test") {
    val out = testDf.select(StrictTypes.fifelseStrict(testDf, col("t"),
      col("yi"), col("ni")).as("v")).collect()
    assert(out(3).isNullAt(0))
    assert(out.take(3).map(_.getInt(0)).toSeq == Seq(1, 12, 3))
  }

  // ---- 5. int-width mixes promote to the widest integral ---------------
  test("fifelse int/long mix promotes to long (Spark widths of INTSXP)") {
    val d2 = testDf.withColumn("yl", col("i").cast("long"))
    val out = d2.select(StrictTypes.fifelseStrict(d2, col("t"),
      col("yl"), col("ni"), lit(null)).as("v"))
    assert(out.schema("v").dataType == org.apache.spark.sql.types.LongType)
  }

  // ---- 6. fcase does NOT promote: reference-numbered error -------------
  test("ref 2127.21: fcase int branch vs double branch errors with argument numbers") {
    val e = intercept[IllegalArgumentException] {
      StrictTypes.fcaseStrict(testDf,
        Seq(col("t") -> col("yi"), !col("t") -> col("nd")))
    }
    assert(e.getMessage ==
      "Argument #4 is of type double, however argument #2 is of type int. " +
        "Please make sure all output values have the same type.")
  }

  // ---- 7. fcase default mismatch: 'default'-shaped error ---------------
  test("ref 2127.24: fcase default class mismatch errors with the default-shaped message") {
    val e = intercept[IllegalArgumentException] {
      StrictTypes.fcaseStrict(testDf,
        Seq(col("t") -> col("yi")), default = lit("2019-10-15"))
    }
    assert(e.getMessage ==
      "Resulting value is of type int but 'default' is of type string. " +
        "Please make sure that both arguments have the same type.")
  }

  // ---- frank ties="random" × na.last (1962.026/.027) -------------------
  // x = c(1,1,2,5,3,3,NA,4) shape: ties at positions {1,2} and {5,6};
  // untied rows keep EXACT first-style ranks, tied rows get a
  // permutation of their slots; na.last variants place/remove the NA.

  private def frankDf = Seq[(Long, java.lang.Double)](
    (1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 5.0),
    (5L, 3.0), (6L, 3.0), (7L, null), (8L, 4.0))
    .toDF("id", "v").withColumn("g", lit("a"))

  private def ranks(naLast: String, seed: Option[Long]): Map[Long, Option[Long]] =
    Windows.frankNa(frankDf, col("v"), desc = false, "random", Seq("g"),
        naLast, "rk", appearance = Seq(col("id").asc), randomSeed = seed)
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("rk"))) None
         else Some(r.getAs[Number]("rk").longValue()))).toMap

  test("ref 1962.026: random ties — untied rows exact, tied rows a permutation of their slots") {
    val f = ranks("true", Some(7L))
    assert(f(3L) == Some(3L) && f(4L) == Some(7L) && f(8L) == Some(6L))
    assert(Set(f(1L), f(2L)).flatten == Set(1L, 2L))
    assert(Set(f(5L), f(6L)).flatten == Set(4L, 5L))
    assert(f(7L) == Some(8L)) // na.last=TRUE: the NA ranks last
  }

  test("ref 1962.027: random × na.last=NA removes the NA row; ranks run over non-NA only") {
    val f = ranks("NA", Some(7L))
    assert(!f.contains(7L) && f.size == 7)
    assert(f(3L) == Some(3L) && f(4L) == Some(7L) && f(8L) == Some(6L))
    assert(Set(f(1L), f(2L)).flatten == Set(1L, 2L))
    assert(Set(f(5L), f(6L)).flatten == Set(4L, 5L))
  }

  test("frank random × na.last=keep: NA rank is NA, non-NA slots unchanged") {
    val f = ranks("keep", Some(7L))
    assert(f(7L).isEmpty)
    assert(f(4L) == Some(7L)) // non-NA ranks still span 1..7
  }

  test("frank random with a fixed seed is reproducible") {
    assert(ranks("true", Some(42L)) == ranks("true", Some(42L)))
  }

  // ---- shift fill Date↔POSIXct refusal (1463.81/.82) -------------------

  private def dateDf = Seq(
    (1L, java.sql.Date.valueOf("2024-01-01"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
    (2L, java.sql.Date.valueOf("2024-01-02"),
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
    .toDF("id", "d", "p").withColumn("g", lit("a"))

  test("ref 1463.81: shift(Date, fill=POSIXct) is refused") {
    val e = intercept[IllegalArgumentException] {
      Windows.shiftDF(dateDf, "out", col("d"), 1, Seq("g"),
        Seq(col("id").asc), fill = col("p"))
    }
    assert(e.getMessage ==
      "Filling Date with POSIXct using shift() is unsupported. " +
        "Please convert fill to Date first.")
  }

  test("ref 1463.82: shift(POSIXct, fill=Date) is refused") {
    val e = intercept[IllegalArgumentException] {
      Windows.shiftDF(dateDf, "out", col("p"), 1, Seq("g"),
        Seq(col("id").asc), fill = lit(java.sql.Date.valueOf("2024-01-01")))
    }
    assert(e.getMessage ==
      "Filling POSIXct with Date using shift() is unsupported. " +
        "Please convert fill to POSIXct first.")
  }

  test("shift Date with a Date fill still works (the guard is the cross pair only)") {
    val out = Windows.shiftDF(dateDf, "out", col("d"), 1, Seq("g"),
      Seq(col("id").asc), fill = lit(java.sql.Date.valueOf("1999-12-31")))
      .orderBy("id").collect()
    assert(out(0).getDate(out(0).fieldIndex("out")).toString == "1999-12-31")
    assert(out(1).getDate(out(1).fieldIndex("out")).toString == "2024-01-01")
  }

  // ---- rbindlist fill=TRUE × use.names=FALSE, unequal widths -----------

  test("ref 2003.4: (a,c)+(b) under fill=TRUE binds b into a positionally, c fills NA") {
    val r = Reshape.rbindlist(Seq(
        Seq((1, 5), (2, 6)).toDF("a", "c"),
        Seq(3, 4).toDF("b")),
      fill = true, useNames = false)
    assert(r.columns.toSeq == Seq("a", "c"))
    assert(r.orderBy("a").collect().map(x =>
      (x.getInt(0), if (x.isNullAt(1)) null else x.getInt(1))).toSeq ==
      Seq((1, 5), (2, 6), (3, null), (4, null)))
  }

  test("ref 2003.5: (a)+(b,c) under fill=TRUE yields columns (a, c)") {
    val r = Reshape.rbindlist(Seq(
        Seq(1, 2).toDF("a"),
        Seq((3, 5), (4, 6)).toDF("b", "c")),
      fill = true, useNames = false)
    assert(r.columns.toSeq == Seq("a", "c"))
    assert(r.orderBy("a").collect().map(x =>
      (x.getInt(0), if (x.isNullAt(1)) null else x.getInt(1))).toSeq ==
      Seq((1, null), (2, null), (3, 5), (4, 6)))
  }

  test("ref 2003.6: unequal widths also promote across the positional bind") {
    // (1.0) + (2L, 3L): position 1 promotes int+double → double
    val r = Reshape.rbindlist(Seq(
        Seq(1.0).toDF("x"),
        Seq((2, 3)).toDF("p", "q")),
      fill = true, useNames = false)
    assert(r.columns.toSeq == Seq("x", "q"))
    assert(r.schema("x").dataType == org.apache.spark.sql.types.DoubleType)
    assert(r.orderBy("x").collect().map(x =>
      (x.getDouble(0), if (x.isNullAt(1)) null else x.getInt(1))).toSeq ==
      Seq((1.0, null), (2.0, 3)))
  }

  test("rbindlist(use.names=FALSE, fill=FALSE) still refuses unequal widths") {
    val e = intercept[IllegalArgumentException] {
      Reshape.rbindlist(Seq(Seq(1).toDF("a"), Seq((2, 3)).toDF("b", "c")),
        fill = false, useNames = false)
    }
    assert(e.getMessage.contains("To fill missing columns use fill=TRUE"))
  }

  // ---- rbindlist string promotion spells values like as.character ------

  test("rbindlist logical+character promotes with R's TRUE/FALSE spelling") {
    val r = Reshape.rbindlist(Seq(
        Seq[(Int, java.lang.Boolean)]((1, true), (2, false), (3, null))
          .toDF("id", "v"),
        Seq((4, "x")).toDF("id", "v")))
    assert(r.orderBy("id").collect().map(x =>
      if (x.isNullAt(1)) null else x.getString(1)).toSeq ==
      Seq("TRUE", "FALSE", null, "x"))
  }

  test("rbindlist double+character promotes with R's shortest-form numerals") {
    // as.character(3.0) is "3", as.character(0.1+0.2) is
    // "0.300000000000000" at 15 s.f. — Spark's cast would say "3.0"
    val r = Reshape.rbindlist(Seq(
        Seq((1, 3.0), (2, 0.25)).toDF("id", "v"),
        Seq((3, "x")).toDF("id", "v")))
    assert(r.orderBy("id").collect().map(x =>
      if (x.isNullAt(1)) null else x.getString(1)).toSeq ==
      Seq("3", "0.25", "x"))
  }
}
