package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Streaming MinHash+LSH near-dup candidates (round-5 stretch): banding
  * state keyed on (band, bandHash), watermark + event-time TTL bounded.
  */
class StreamingMinhashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val dupText = "the quick brown fox jumps over the lazy dog again and again"

  test("near-dup candidates emit on bucket co-residency and stop after TTL expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val cands = Streams.nearDupCandidatesStream(ms.toDF(), "doc_id", "ts", "text",
      watermark = "30 seconds", stateTtlMillis = 60 * 1000L)
    val q = cands.writeStream.outputMode("append")
      .format("memory").queryName("minhash_stream").start()
    try {
      def pairs(): Set[(Long, Long)] =
        spark.sql("SELECT DISTINCT idA, idB FROM minhash_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet

      // batch 1: two exact near-dups + one unrelated doc
      ms.addData(
        Doc(1, ts("2024-01-01 10:00:00"), dupText),
        Doc(2, ts("2024-01-01 10:00:01"), dupText),
        Doc(3, ts("2024-01-01 10:00:02"), "completely different content about spark plans"))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)), "identical docs must pair; distinct doc must not")

      // batch 2: a third dup inside the TTL horizon pairs with BOTH
      ms.addData(Doc(4, ts("2024-01-01 10:00:10"), dupText))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (1L, 4L), (2L, 4L)),
        "state must carry bucket membership across micro-batches")

      // batches 3-4: unrelated traffic advances the watermark past
      // lastTs + TTL (10:01:10), letting the idle buckets time out
      ms.addData(Doc(90, ts("2024-01-01 10:05:00"), "noise one advancing the watermark"))
      q.processAllAvailable()
      ms.addData(Doc(91, ts("2024-01-01 10:06:00"), "noise two advancing the watermark"))
      q.processAllAvailable()

      // batch 5: the same text after expiry starts a FRESH bucket
      ms.addData(Doc(5, ts("2024-01-01 10:06:30"), dupText))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (1L, 4L), (2L, 4L)),
        "expired buckets must not pair with new arrivals")
    } finally q.stop()
  }

  test("saturated buckets stop emitting pairs (degenerate boilerplate cap)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val cands = Streams.nearDupCandidatesStream(ms.toDF(), "doc_id", "ts", "text",
      watermark = "30 seconds", stateTtlMillis = 600 * 1000L, maxBucket = 3)
    val q = cands.writeStream.outputMode("append")
      .format("memory").queryName("minhash_sat").start()
    try {
      ms.addData((1 to 6).map(i =>
        Doc(i.toLong, ts(s"2024-01-01 10:00:0$i"), dupText)): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT idA, idB FROM minhash_sat").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // docs are processed in ts order; membership caps at 4 (3 + the
      // saturating arrival), so pairs only form among docs 1..4
      val expected = (for { a <- 1 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong)).toSet
      assert(got == expected, s"got $got")
    } finally q.stop()
  }
}
