package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curate.Contamination

/** Round-11 hardening: the round-10 advisory closures (bloom cap clamp,
  * merge by.x/by.y pre-clash suffixing, type-aware splitBy ordering,
  * SessionMemo single-compute under races) plus the tests.Rraw tranche
  * of the round.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- advisory medium: bloom est/bits above the session caps ---------

  test("ngramOverlapBloomDistributed clamps est/bits above the runtime bloom caps") {
    Contamination.clearFits()
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four"),
      (3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val bench = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // estimatedGrams far above the default maxNumItems (4,194,304):
    // the old form threw DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE at
    // analysis — exactly at the giant-bench scale this tier exists for
    val got = Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 2, estimatedGrams = 50_000_000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact semantics preserved: docs 1 and 3 share the bench bigrams
    val exact = Contamination.ngramOverlap(
      corpus, bench, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.keySet == Set(1L, 3L))
  }

  // ---- advisory low: merge by.x/by.y clash + by alongside byX ----------

  test("merge by.x/by.y suffixes a pre-existing y column named like the x key") {
    val x = Seq((1, "a1"), (2, "a2")).toDF("id", "xv")
    // y's PAYLOAD column `id` clashes with x's key name while joining
    // on yk — the reference emits it as `id.y`
    val y = Seq((1, 100, "b1"), (2, 200, "b2")).toDF("yk", "id", "yv")
    val m = DT(x).merge(DT(y), byX = Seq("id"), byY = Seq("yk"))
    assert(m.df.columns.toSeq == Seq("id", "xv", "id.y", "yv"))
    val rows = m.df.orderBy(col("id")).collect()
    assert(rows.map(_.getInt(2)).toSeq == Seq(100, 200))
  }

  test("merge refuses by= alongside by.x/by.y instead of silently ignoring it") {
    val x = Seq((1, "a")).toDF("id", "xv")
    val y = Seq((1, "b")).toDF("yk", "yv")
    val e = intercept[IllegalArgumentException] {
      DT(x).merge(DT(y), by = Seq("id"), byX = Seq("id"), byY = Seq("yk"))
    }
    assert(e.getMessage.contains("not both"))
  }

  // ---- advisory low: splitBy(sorted=true) type-aware piece order -------

  test("splitBy(sorted=true) orders numeric keys numerically, NA last") {
    val df = Seq(
      (10, "x"), (2, "y"), (1, "z"), (10, "w")).toDF("k", "v")
      .unionByName(Seq((Option.empty[Int], "n")).toDF("k", "v"))
    val pieces = DT(df).splitBy(Seq("k"), sorted = true)
    // a string sort would yield 1 < 10 < 2; numeric order is 1, 2, 10
    assert(pieces.keys.toSeq == Seq(Seq("1"), Seq("2"), Seq("10"), Seq("NA")))
  }

  // ---- advisory low: SessionMemo per-key lock ---------------------------

  test("SessionMemo computes once per key under concurrent callers and keeps the cache") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val memo = new SessionMemo[org.apache.spark.sql.DataFrame](_.unpersist())
    def frame() = {
      computes.incrementAndGet()
      val f = spark.range(100).toDF("n").persist()
      f.count()
      f
    }
    val results = Await.result(
      Future.sequence((1 to 8).map(_ => Future(memo.getOrElsePut("k")(frame())))),
      60.seconds)
    // one compute, every caller sees the registered frame, and the
    // cache survives (the old loser-unpersist raced CacheManager's
    // plan-keyed registry and silently uncached the winner)
    assert(computes.get() == 1)
    assert(results.forall(_ eq results.head))
    assert(results.head.storageLevel.useMemory)
    memo.clear()
    assert(!results.head.storageLevel.useMemory)
  }
}
