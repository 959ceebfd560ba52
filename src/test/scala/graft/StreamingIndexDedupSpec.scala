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

  test("restart from checkpoint mid-corpus: no duplicate and no lost matches") {
    // The batch ingest loop is spec-locked across session restarts
    // (IngestSpec); this is the STREAMING twin: kill the query after
    // batch 1, enqueue batch 2 while it is down, restart from the same
    // checkpoint, and require exactly-once output across the restart —
    // the dropDuplicatesWithinWatermark state and source offsets must
    // both restore.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = Seq((1L, dupText), (2L, dupText + "!")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_ridx").toString
    Dedup.saveBandIndex(base, "doc_id", "text", idx)
    val sink = java.nio.file.Files.createTempDirectory("graft_rsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rckpt").toString

    val ms = MemoryStream[Doc]
    def start() = Streams.dedupAgainstIndexStream(ms.toDF(), "doc_id", "ts",
        "text", idx, watermark = "10 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", sink).start()

    val q1 = start()
    ms.addData(Doc(100, ts("2024-01-01 10:00:00"), dupText))
    q1.processAllAvailable()
    q1.stop() // kill mid-corpus
    // batch 2 arrives while the query is DOWN
    ms.addData(Doc(102, ts("2024-01-01 10:00:05"), dupText))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(sink)
        .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq.sorted
      // doc 100's matches exactly once (not re-emitted after restart),
      // doc 102's matches exactly once (not lost while down)
      assert(got == Seq((100L, 1L), (100L, 2L), (102L, 1L), (102L, 2L)),
        s"across-restart output: $got")
    } finally q2.stop()
  }
}

/** Streaming semantic dedup vs the persisted cell index: stream output
  * equals the batch semIncremental result, stateless.
  */
class StreamingSemIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Vec(doc_id: Long, ts: java.sql.Timestamp, vec: Seq[Double])
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream matches == batch semIncremental; novel vector passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.sim.Similarity

    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("id", "vec")
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val idx = java.nio.file.Files.createTempDirectory("graft_scellidx").toString
    Similarity.saveCellIndex(corpus, "id", "vec", cents, idx)

    val ms = MemoryStream[Vec]
    val out = graft.streaming.Streams.semDedupAgainstIndexStream(
      ms.toDF(), "doc_id", "ts", "vec", idx, threshold = 0.9)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sem_idx_stream").start()
    try {
      ms.addData(
        Vec(100L, ts("2024-01-01 10:00:00"), Seq(0.99, 0.01, 0.0, 0.0)),
        Vec(101L, ts("2024-01-01 10:00:01"), Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
      val got = spark.sql("SELECT new_id, dup_of FROM sem_idx_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val batch = Similarity.semIncremental(spark, idx,
          Seq((100L, Seq(0.99, 0.01, 0.0, 0.0)),
              (101L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "vec"),
          "id", "vec", threshold = 0.9)
        .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSeq.sorted
      assert(got == batch && got.nonEmpty, s"stream $got vs batch $batch")
      assert(got.forall(_._1 == 100L))
    } finally q.stop()
  }
}
