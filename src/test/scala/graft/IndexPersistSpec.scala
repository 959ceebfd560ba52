package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Fitted-index persistence: IVF centroids and PQ codebooks must make a
  * bit-exact parquet round-trip (fit once, serve many sessions).
  */
class IndexPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_idx_$tag").toString

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
