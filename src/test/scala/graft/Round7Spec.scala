package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Round-7: finish the mult=first/last dedupe-count-explode rewrite to its
  * "done" bar — duplicate physical probe rows, multi-column order, and
  * agreement between the explode tier, the window tier, and multAgg.
  * Reference semantics: /root/reference/src/bmerge.c:32 (mult enum).
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // x has 3 candidate rows for k=1, 1 for k=2, none for k=3.
  private lazy val x = Seq(
    (1, 1, 10, "a"), (1, 1, 20, "b"), (1, 2, 5, "c"),
    (2, 9, 9, "d")).toDF("k", "s1", "s2", "v")

  test("mult explode tier: duplicate probe rows each produce one output row") {
    // probe k=1 appears 3 times (twice with the same payload), k=3 once
    val i = Seq((1, "p"), (1, "p"), (1, "q"), (3, "r"), (2, "z")).toDF("k", "tag")
    val first = Joins.mult(x, i, Seq("k"), "first", Seq($"s1", $"s2"))
    // one output row per PHYSICAL probe row
    assert(first.count() == 5)
    val rows = first.orderBy($"k", $"tag")
      .select($"k", $"tag", $"v").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2))))
    // lexicographic (s1,s2) min for k=1 is (1,10)->"a"
    assert(rows.toSeq == Seq(
      (1, "p", Some("a")), (1, "p", Some("a")), (1, "q", Some("a")),
      (2, "z", Some("d")), (3, "r", None)))
  }

  test("mult last: multi-column order picks lexicographic max via max_by") {
    val i = Seq((1, "p"), (1, "p")).toDF("k", "tag")
    val out = Joins.mult(x, i, Seq("k"), "last", Seq($"s1", $"s2"))
      .select($"v").as[String].collect()
    // lexicographic (s1,s2) max for k=1 is (2,5)->"c", for both probe rows
    assert(out.toSeq == Seq("c", "c"))
  }

  test("mult: explode tier agrees with window tier and multAgg on unique probes") {
    val i = Seq((1, "p"), (2, "q"), (3, "r")).toDF("k", "tag")
    def norm(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Option[String])] =
      df.select($"k", $"tag", $"v").collect()
        .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSeq.sorted
    for (m <- Seq("first", "last")) {
      val explodeTier = norm(Joins.mult(x, i, Seq("k"), m, Seq($"s1", $"s2")))
      val windowTier = norm(Joins.mult(x, i, Seq("k"), m, Seq($"s1", $"s2"),
        probeUnique = true))
      val aggTier = norm(Joins.multAgg(x, i, Seq("k"), m, Seq($"s1", $"s2")))
      assert(explodeTier == windowTier, s"explode vs window, mult=$m")
      assert(explodeTier == aggTier, s"explode vs agg, mult=$m")
    }
  }

  test("mult: internal count column dodges a _graft_mxn0 clash in inputs") {
    val xc = x.withColumn("_graft_mxn0", lit(1))
    val i = Seq((1, "p"), (1, "p")).toDF("k", "tag")
    val out = Joins.mult(xc, i, Seq("k"), "first", Seq($"s1", $"s2"))
    assert(out.count() == 2)
    assert(out.columns.contains("_graft_mxn0")) // x payload survives
    val ic = i.withColumn("_graft_mxn0", lit(2))
    val out2 = Joins.mult(x, ic, Seq("k"), "first", Seq($"s1", $"s2"))
    assert(out2.count() == 2 && out2.columns.contains("_graft_mxn0"))
  }
}
