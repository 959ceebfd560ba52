package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions: sampled-mod kmeans fit, bench detail output. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kmeansFitMod fits on the mod-m sample only, deterministically") {
    val vecs = (0 until 40).map { i =>
      val base = i % 4
      (i.toLong, (0 until 8).map(d =>
        (if (d == base * 2) 1.0 else 0.05) + 0.001 * ((i * 7 + d) % 5)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val c1 = graft.sim.Similarity.kmeansFitMod(df, "vec_id", "embedding",
      k = 4, m = 4, iters = 3)
    val c2 = graft.sim.Similarity.kmeansFitMod(df, "vec_id", "embedding",
      k = 4, m = 4, iters = 3)
    assert(c1 == c2, "sampled fit must be bit-deterministic across runs")

    // the fit must equal running the full-corpus fit on just the sample:
    // ids 0,4,8,...,36 — same seeds (4 lowest sampled ids), same rounds
    val sample = vecs.filter(_._1 % 4 == 0).toDF("vec_id", "embedding")
    val cs = graft.sim.Similarity.kmeansFit(sample, "vec_id", "embedding",
      k = 4, iters = 3)
    assert(c1 == cs, "mod-sampled fit == full fit restricted to the sample")
  }
}
