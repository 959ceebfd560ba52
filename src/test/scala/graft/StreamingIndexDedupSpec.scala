package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.streaming.Streams

/** Streaming dedup against a persisted corpus band index: stream docs
  * must match exactly what the batch indexed path reports, once each.
  */
class StreamingIndexDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val dupText = "the quick brown fox jumps over the lazy dog again and again"

  test("stream matches == batch indexed matches; novel docs pass silently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = Seq(
      (1L, dupText),
      (2L, dupText + "!"),
      (3L, "an entirely different document about spark catalyst planning rules")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    Dedup.saveBandIndex(base, "doc_id", "text", idx)

    val ms = MemoryStream[Doc]
    val out = Streams.dedupAgainstIndexStream(ms.toDF(), "doc_id", "ts", "text",
      idx, watermark = "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("idx_dedup_stream").start()
    try {
      ms.addData(
        Doc(100, ts("2024-01-01 10:00:00"), dupText),
        Doc(101, ts("2024-01-01 10:00:01"), "novel content matching nothing at all today"))
      q.processAllAvailable()
      val got = spark.sql("SELECT new_id, dup_of FROM idx_dedup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

      val batch = Dedup.minhashIncrementalIndexed(spark, idx,
          Seq((100L, dupText),
              (101L, "novel content matching nothing at all today")).toDF("doc_id", "text"),
          "doc_id", "text")
        .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq

      assert(got.sorted == batch.sorted, s"stream $got vs batch $batch")
      assert(got.nonEmpty && got.forall(_._1 == 100L))
      // each pair exactly once despite multi-band collisions
      assert(got.distinct.size == got.size)
    } finally q.stop()
  }
}
