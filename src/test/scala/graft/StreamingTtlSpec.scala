package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Event-time-timeout as-of enrichment: late probes and state expiry
  * (round-2 item: production state policy for asofEnrichStream).
  */
class StreamingTtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(policy: String)(
      feed: (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit): Map[Long, Option[Double]] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val src = ms.toDS().withWatermark("ts", "30 minutes").as[Ev]
    val enriched = Streams.asofEnrichStreamTtl(src, "purchase", "click",
      stateTtlMillis = 60 * 1000L, lateProbePolicy = policy)
    val name = s"asof_ttl_$policy"
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      feed(ms, q)
      spark.sql(s"SELECT event_id, last_match FROM $name").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    } finally q.stop()
  }

  test("in-order probe enriches; late probe follows policy; state expires after TTL") {
    val out = run("null") { (ms, q) =>
      // batch 1: reference then probe, in order
      ms.addData(
        Ev(1, 7L, ts("2024-01-01 10:00:00"), "purchase", 100.0),
        Ev(2, 7L, ts("2024-01-01 10:00:30"), "click", 0.0))
      q.processAllAvailable()
      // batch 2: probe OLDER than the prevailing reference (late arrival)
      ms.addData(Ev(3, 7L, ts("2024-01-01 09:59:00"), "click", 0.0))
      q.processAllAvailable()
      // batch 3: unrelated user advances the watermark (maxTs − 30 min)
      // past refTs+TTL = 10:01:00
      ms.addData(Ev(4, 8L, ts("2024-01-01 10:35:00"), "noise", 0.0))
      q.processAllAvailable()
      // batch 4: another tick lets user 7's (inputless) timeout fire
      ms.addData(Ev(5, 8L, ts("2024-01-01 10:40:00"), "noise", 0.0))
      q.processAllAvailable()
      // batch 5: probe after expiry → no prevailing state
      ms.addData(Ev(6, 7L, ts("2024-01-01 10:41:00"), "click", 0.0))
      q.processAllAvailable()
    }
    assert(out(2L) == Some(100.0))   // normal LOCF
    assert(out(3L) == None)          // late probe, policy "null"
    assert(out(6L) == None)          // state expired by event-time TTL
  }

  test("lateProbePolicy=enrich attaches the newer reference value") {
    val out = run("enrich") { (ms, q) =>
      ms.addData(Ev(1, 9L, ts("2024-01-01 10:00:00"), "purchase", 42.0))
      q.processAllAvailable()
      ms.addData(Ev(2, 9L, ts("2024-01-01 09:58:00"), "click", 0.0))
      q.processAllAvailable()
    }
    assert(out(2L) == Some(42.0))
  }
}

/** Stream-stream as-of: two sources, one stateful pass. */
class StreamStreamAsofSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofEnrichTwoStreams enriches probes from a separate reference stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val refs = MemoryStream[Ev]
    val probes = MemoryStream[Ev]
    val out = Streams.asofEnrichTwoStreams(
      refs.toDS().withWatermark("ts", "10 minutes").as[Ev],
      probes.toDS().withWatermark("ts", "10 minutes").as[Ev],
      "purchase", "click", stateTtlMillis = 3600 * 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ss_asof").start()
    try {
      refs.addData(Ev(1, 5L, ts("2024-01-01 09:00:00"), "purchase", 77.0))
      q.processAllAvailable()
      probes.addData(Ev(2, 5L, ts("2024-01-01 09:05:00"), "click", 0.0),
        Ev(3, 6L, ts("2024-01-01 09:06:00"), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, last_match FROM ss_asof").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(rows(2L) == Some(77.0))   // cross-stream LOCF
      assert(rows(3L) == None)         // user with no reference
    } finally q.stop()
  }
}

/** Watermarked stream-stream interval join. */
class IntervalJoinStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("intervalJoinStreams matches rows within the lookback window only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = Streams.intervalJoinStreams(
      clicks.toDS().toDF().select($"event_id".as("click_id"), $"user_id", $"ts"),
      buys.toDS().toDF().select($"event_id".as("buy_id"), $"user_id", $"ts".as("bts"),
        $"value"),
      on = Seq("user_id"), leftTs = "ts", rightTs = "bts",
      lookback = "30 MINUTES", watermark = "10 minutes")
    val q = joined.select($"click_id", $"buy_id", $"value")
      .writeStream.outputMode("append").format("memory")
      .queryName("ivj_out").start()
    try {
      buys.addData(
        Ev(100, 1L, ts("2024-01-01 10:00:00"), "purchase", 5.0),   // in window
        Ev(101, 1L, ts("2024-01-01 09:00:00"), "purchase", 7.0))   // too old
      clicks.addData(Ev(1, 1L, ts("2024-01-01 10:20:00"), "click", 0.0),
        Ev(2, 2L, ts("2024-01-01 10:21:00"), "click", 0.0))        // no buys
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, buy_id FROM ivj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 100L)))
    } finally q.stop()
  }
}
