package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Fitted-index persistence: IVF centroids and PQ codebooks must make a
  * bit-exact parquet round-trip (fit once, serve many sessions).
  */
class IndexPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String): String =
    TestTmp.dir(s"graft_idx_$tag").toString

  test("IVF centroids round-trip bit-exactly in cell order") {
    val cents = Seq(
      Seq(0.25, -1.5, 3.000000001, 0.0),
      Seq(1.0 / 3.0, math.Pi, -0.0, 42.0),
      Seq(1e-300, 1e300, -7.25, 0.1))
    val dir = tmp("ivf")
    Similarity.saveIvfIndex(spark, dir, cents)
    assert(Similarity.loadIvfIndex(spark, dir) == cents)
  }

  test("PQ codebooks round-trip in (subspace, code) order") {
    val cbs = Seq(
      Seq(Seq(0.1, 0.2), Seq(-0.3, 0.4), Seq(0.5, -0.6)),
      Seq(Seq(1.0 / 7.0, 2.0 / 7.0), Seq(3.0 / 7.0, 4.0 / 7.0), Seq(0.0, -1.0)))
    val dir = tmp("pq")
    Similarity.savePqIndex(spark, dir, cbs)
    assert(Similarity.loadPqIndex(spark, dir) == cbs)
  }

  test("empty index save is refused") {
    intercept[IllegalArgumentException] {
      Similarity.saveIvfIndex(spark, tmp("e1"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Similarity.savePqIndex(spark, tmp("e2"), Seq.empty)
    }
  }
}

/** Incremental SemDeDup against the persisted cell index: twins match
  * their originals, novel vectors pass, and index reload is enough.
  */
class SemIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("batch twin matches its original through the saved index; orthogonal vector is novel") {
    import spark.implicits._
    import graft.sim.Similarity
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("id", "vec")
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val dir = TestTmp.dir("graft_cellidx").toString
    Similarity.saveCellIndex(corpus, "id", "vec", cents, dir)
    val batch = Seq(
      (100L, Seq(0.99, 0.01, 0.0, 0.0)),   // ≈ id 1 / 3
      (101L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "vec")
    val out = Similarity.semIncremental(spark, dir, batch, "id", "vec",
        threshold = 0.9)
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.forall(_._1 == 100L), s"novel vector matched: $out")
    assert(out.map(_._2).toSet.subsetOf(Set(1L, 3L)))
  }
}

/** Cell-index ingest loop: append day-1 novel vectors, day-2 re-post
  * matches the grown index.
  */
class CellIndexLoopSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("two-day loop through the appended cell index") {
    import spark.implicits._
    import graft.sim.Similarity
    val corpus = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("id", "vec")
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val idx = TestTmp.dir("graft_cellloop").toString
    Similarity.saveCellIndex(corpus, "id", "vec", cents, idx)
    // day 1: orthogonal vector is novel -> append it
    val day1 = Seq((100L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "vec")
    assert(Similarity.semIncremental(spark, idx, day1, "id", "vec", 0.9).count() == 0)
    Similarity.appendToCellIndex(spark, idx, day1, "id", "vec")
    // day 2: a re-post of day-1's vector must match the GROWN index
    val day2 = Seq((200L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "vec")
    val m = Similarity.semIncremental(spark, idx, day2, "id", "vec", 0.9)
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq
    assert(m == Seq((200L, 100L)), s"day-2 must match appended vector: $m")
  }
}
