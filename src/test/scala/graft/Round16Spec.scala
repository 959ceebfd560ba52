package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening: the ShuffleMeter retry fix (max-per-stageId
  * accounting so a load-induced stage retry can't inflate `shuf_w`),
  * plus this round's ADVICE closures.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ---- ShuffleMeter: retried stage attempts must not double-count ------

  test("ShuffleMeter merges retried stage attempts by max, not sum") {
    val meter = new Bench.ShuffleMeter(spark.sparkContext)
    val base = meter.snapshot() // whatever other suites already ran

    // planted retry, shape A: attempt 0 completed with the full volume,
    // a downstream fetch failure re-ran a subset (attempt 1 re-fires
    // onStageCompleted for the SAME stageId with the re-executed tasks'
    // bytes). Round 15's summing meter recorded 941626+677058 here; the
    // plan's true volume is attempt 0's.
    meter.record(1000001, 941626L)
    meter.record(1000001, 677058L)
    // shape B: attempt 0 died before writing, attempt 1 wrote everything
    meter.record(1000002, 0L)
    meter.record(1000002, 80L)
    // unretried stage for good measure
    meter.record(1000003, 7L)

    assert(meter.snapshot() - base == 941626L + 80L + 7L,
      "retried attempts must merge by max per stageId")
  }

  test("ShuffleMeter still meters real shuffles after the retry fix") {
    val meter = new Bench.ShuffleMeter(spark.sparkContext)
    val nation = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    val s0 = meter.snapshot()
    nation.repartition(4, $"n_regionkey").agg(count(lit(1))).collect()
    val s1 = meter.snapshot()
    assert(s1 - s0 > 0, "repartition wrote no shuffle bytes?")
  }
}
