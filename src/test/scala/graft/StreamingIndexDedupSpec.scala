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
  case class V(doc_id: Long, vec: Seq[Double])
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
    val idx = TestTmp.dir("graft_sidx").toString
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
    val idx = TestTmp.dir("graft_ridx").toString
    Dedup.saveBandIndex(base, "doc_id", "text", idx)
    val sink = TestTmp.dir("graft_rsink").toString
    val ckpt = TestTmp.dir("graft_rckpt").toString

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

  test("reloading writer picks up an EXTERNAL index overwrite without a restart") {
    // A nightly job (simulated with a raw filesystem copy no graft
    // writer knows about) replaces the index while the query runs; the
    // foreachBatch form must evict the session memo and re-read, so the
    // very next batch matches against the NEW corpus. The stream-static
    // form cannot do this — its file listing is frozen at definition.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val otherText =
      "a completely separate corpus of words about gardens and rivers flowing south"
    val idx = TestTmp.dir("graft_relidx").toString
    val idxV2 = TestTmp.dir("graft_relidx2").toString
    Dedup.saveBandIndex(Seq((1L, dupText)).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    Dedup.saveBandIndex(Seq((7L, otherText)).toDF("doc_id", "text"),
      "doc_id", "text", idxV2)

    def copyDir(from: String, to: String): Unit = {
      import java.nio.file.{Files, Paths, Path, StandardCopyOption}
      val src = Paths.get(from); val dst = Paths.get(to)
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).forEach((c: Path) => rm(c))
        Files.deleteIfExists(p)
      }
      rm(dst)
      Files.walk(src).forEach { (p: Path) =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[Doc]
    val q = Streams.dedupAgainstIndexReloadingWriter(
        ms.toDF(), "doc_id", "text", idx)( m =>
      results ++= m.select($"new_id", $"dup_of").as[(Long, Long)].collect()
    ).start()
    try {
      ms.addData(Doc(100, ts("2024-01-01 10:00:00"), dupText),
                 Doc(101, ts("2024-01-01 10:00:01"), otherText))
      q.processAllAvailable()
      assert(results.toSet == Set((100L, 1L)),
        s"v1 batch should match corpus v1 only: $results")

      copyDir(idxV2, idx) // the external nightly refit
      results.clear()
      ms.addData(Doc(102, ts("2024-01-01 10:00:05"), dupText),
                 Doc(103, ts("2024-01-01 10:00:06"), otherText))
      q.processAllAvailable()
      assert(results.toSet == Set((103L, 7L)),
        s"post-refit batch should match corpus v2 only: $results")
    } finally q.stop()
  }

  test("semantic reloading writer sees an in-session cell-index append at the next batch") {
    // appendToCellIndex grows the corpus between micro-batches; the
    // reloading writer re-reads per batch so the appended vector is
    // matchable WITHOUT restarting — the stream-static form's frozen
    // file listing would never see it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.sim.Similarity

    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val idx = TestTmp.dir("graft_relcell").toString
    Similarity.saveCellIndex(
      Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec"), "id", "vec", cents, idx)

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[V]
    val q = Streams.semDedupAgainstIndexReloadingWriter(
        ms.toDF(), "doc_id", "vec", idx, threshold = 0.9)( m =>
      results ++= m.select($"new_id", $"dup_of").as[(Long, Long)].collect()
    ).start()
    try {
      ms.addData(V(100L, Seq(0.0, 1.0)))
      q.processAllAvailable()
      assert(results.isEmpty, s"nothing near (0,1) in the v1 index: $results")

      Similarity.appendToCellIndex(spark, idx,
        Seq((2L, Seq(0.0, 1.0))).toDF("id", "vec"), "id", "vec")
      ms.addData(V(101L, Seq(0.0, 1.0)))
      q.processAllAvailable()
      assert(results.toSet == Set((101L, 2L)),
        s"appended vector must be matchable at the next batch: $results")
    } finally q.stop()
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
    val idx = TestTmp.dir("graft_scellidx").toString
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
