package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-column frollapply frames (R/frollapply.R `.SD` input;
  * round-3 item 4).
  */
class FrollMultiColSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rolling weighted mean over a (value, weight) struct frame") {
    val df = Seq(
      ("g", 1, 10.0, 1.0), ("g", 2, 20.0, 3.0), ("g", 3, 30.0, 1.0))
      .toDF("g", "o", "v", "w")
    val fr = graft.operators.Windows.frollWindowStructs(
      Seq("v" -> $"v", "w" -> $"w"), 2, Seq("g"), Seq($"o".asc))
    val num = aggregate(fr, lit(0.0), (a, x) => a + x.getField("v") * x.getField("w"))
    val den = aggregate(fr, lit(0.0), (a, x) => a + x.getField("w"))
    val out = df.withColumn("wm", when(size(fr) === 2, num / den))
      .orderBy($"o").select($"wm").as[Option[Double]].collect().toSeq
    // row1: short frame -> null; row2: (10*1+20*3)/4 = 17.5; row3: (20*3+30*1)/4 = 22.5
    assert(out == Seq(None, Some(17.5), Some(22.5)))
  }

  test("struct frames keep null fields (na.rm=FALSE composable)") {
    val df = Seq(("g", 1, Some(1.0)), ("g", 2, None), ("g", 3, Some(3.0)))
      .toDF("g", "o", "v")
    val fr = graft.operators.Windows.frollWindowStructs(
      Seq("v" -> $"v"), 2, Seq("g"), Seq($"o".asc))
    val sizes = df.withColumn("n", size(fr)).orderBy($"o")
      .select($"n").as[Int].collect().toSeq
    assert(sizes == Seq(1, 2, 2), "null rows must stay in the physical frame")
    val hasNull = df.withColumn("hn", exists(fr, s => s.getField("v").isNull))
      .orderBy($"o").select($"hn").as[Boolean].collect().toSeq
    assert(hasNull == Seq(false, true, true))
  }

  test("empty column list is rejected") {
    intercept[IllegalArgumentException] {
      graft.operators.Windows.frollWindowStructs(Nil, 2, Seq("g"), Seq(lit(1).asc))
    }
  }

  test("global frame requires explicit opt-in") {
    intercept[IllegalArgumentException] {
      graft.operators.Windows.frollWindowStructs(Seq("v" -> lit(1)), 2, Nil, Seq(lit(1).asc))
    }
  }
}
