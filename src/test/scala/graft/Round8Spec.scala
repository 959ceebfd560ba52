package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reshape

/** Round-8: melt measure(fun=) type dispatch (R/fmelt.R:133-153) and
  * the DSIR value-histogram selection tier.
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val wide = Seq((1, 10.0, 20.0, 0.1, 0.2))
    .toDF("id", "a_1", "a_2", "b_1", "b_2")

  test("measure(fun=) converts a dim group to a typed column") {
    val long = Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
      Seq("value.name", "dim"),
      convert = Map("dim" -> ((d: String) => d.toInt)))
    assert(long.schema("dim").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = long.orderBy($"dim")
      .select($"dim", $"a", $"b").as[(Int, Double, Double)].collect().toSeq
    assert(rows == Seq((1, 10.0, 0.1), (2, 20.0, 0.2)))
  }

  test("measure(sep=, fun=): literal-sep split form, off-width columns ignored") {
    val df = Seq((1, 10.0, 20.0, 7.0)).toDF("id", "a_1", "a_2", "ignored")
    val long = Reshape.meltMeasureSepN(df, Seq("id"), "_",
      Seq("value.name", "dim"),
      convert = Map("dim" -> ((d: String) => d.toLong)))
    assert(long.columns.toSeq == Seq("id", "dim", "a"))
    assert(long.orderBy($"dim").select($"dim", $"a")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 10.0), (2L, 20.0)))
  }

  test("measure(fun=) error paths: all-null, collision, non-string value.name") {
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("dim" -> ((_: String) => null)))
    }
    // converting both suffixes to the same value collides post-conversion
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("dim" -> ((_: String) => 1)))
    }
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("value.name" -> ((_: String) => 2)))
    }
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("nope" -> ((d: String) => d)))
    }
  }

  test("dsir subset fast path == general importanceWeights on a subset target") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"), (2L, "dog runs fast", "en"),
      (3L, "111 222 333", "xx"), (4L, "", "xx"),
      (5L, "the the the", "en"), (6L, "mixed 111 cat", "xx"))
      .toDF("doc_id", "text", "lang")
    val general = graft.curate.Dsir.importanceWeights(docs, "doc_id", "text",
      docs.filter($"lang" === "en"), "text", buckets = 32)
      .select($"doc_id", round($"logw", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    val fast = graft.curate.Dsir.importanceWeightsSubset(docs, "doc_id",
      "text", $"lang" === "en", buckets = 32)
      .select($"doc_id", round($"logw", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    assert(fast.keySet == general.keySet)
    for ((k, v) <- general)
      assert(math.abs(fast(k) - v) < 1e-9, s"doc $k: ${fast(k)} vs $v")
  }

  test("dsir selectAtLeast keeps >= n docs, closed under weight ties") {
    // corpus: 6 en-like docs, 6 digit docs; target = the en-like half
    val docs = (0 until 6).map(i => (i.toLong, "the cat sat on the mat", "en")) ++
      (6 until 12).map(i => (i.toLong, "111 222 333 444 555", "xx"))
    val df = docs.toDF("doc_id", "text", "lang")
    val sel = graft.curate.Dsir.selectAtLeast(df, "doc_id", "text",
      df.filter($"lang" === "en"), "text", n = 2, buckets = 64)
    val ids = sel.select($"doc_id").as[Long].collect().toSet
    // all six en docs tie on the same weight; the threshold keeps the
    // whole tie class, never a partial cut
    assert(ids == (0L until 6L).toSet)
    // n larger than the corpus → everything kept via the -inf fallback
    val all = graft.curate.Dsir.selectAtLeast(df, "doc_id", "text",
      df.filter($"lang" === "en"), "text", n = 100, buckets = 64)
    assert(all.count() == 12)
  }
}
