package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Round-5 session 3: streaming curation gates — stateless quality
  * filter and foreachBatch decontamination.
  */
class StreamingCurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val good = "the data and that table have rows with text of " +
    "words be plain english flowing on for long enough to pass"

  test("qualityFilterStream drops failing docs in-flight, keeps the audit column") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val out = Streams.qualityFilterStream(ms.toDF(), "text", minTokens = 10)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quality_stream").start()
    try {
      ms.addData(
        Doc(1, ts("2024-01-01 10:00:00"), good),
        Doc(2, ts("2024-01-01 10:00:01"), "too short"),
        Doc(3, ts("2024-01-01 10:00:02"), good + " still fine"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, f.reasons FROM quality_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set(1L, 3L))
      assert(rows.values.forall(_ == ""))
    } finally q.stop()
  }

  test("decontaminatedWriter removes benchmark-overlapping docs per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq((100L, "the quick brown fox benchmark item"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[Doc]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: DataFrame => Unit = b =>
      seen.synchronized { seen ++= b.select("doc_id").as[Long].collect() }
    val q = Streams.decontaminatedWriter(ms.toDF(), bench, "doc_id", "text",
      n = 3, sink = sink).start()
    try {
      ms.addData(
        Doc(1, ts("2024-01-01 10:00:00"), "contains the quick brown fox phrase"),
        Doc(2, ts("2024-01-01 10:00:01"), "totally unrelated clean document text"))
      q.processAllAvailable()
      ms.addData(
        Doc(3, ts("2024-01-01 10:00:02"), "another clean one passes through"),
        Doc(4, ts("2024-01-01 10:00:03"), "quick brown fox appears here too"))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == Set(2L, 3L),
        "docs sharing a 3-gram with the benchmark must be dropped")
    } finally q.stop()
  }

  case class VDoc(doc_id: Long, ts: java.sql.Timestamp, vec: Seq[Double])

  test("semDedupPairsStream: cross-batch same-cell near-dups, different cells never pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two well-separated centroids; vectors near each
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val ms = MemoryStream[VDoc]
    val out = Streams.semDedupPairsStream(ms.toDF(), "doc_id", "ts", "vec",
      cents, threshold = 0.95, watermark = "10 seconds",
      stateTtlMillis = 3600 * 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sem_stream").start()
    try {
      ms.addData(
        VDoc(1, ts("2024-01-01 10:00:00"), Seq(1.0, 0.01)),
        VDoc(2, ts("2024-01-01 10:00:01"), Seq(0.01, 1.0)))
      q.processAllAvailable()
      // batch 2: doc 3 is a near-twin of doc 1 (same cell, cross-batch);
      // doc 4 sits in cell 0 but angled away enough to miss threshold
      ms.addData(
        VDoc(3, ts("2024-01-01 10:00:02"), Seq(0.99, 0.02)),
        VDoc(4, ts("2024-01-01 10:00:03"), Seq(0.8, 0.45)))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT idA, idB, cell FROM sem_stream")
        .as[(Long, Long, Int)].collect().toSet
      assert(pairs.contains((1L, 3L, 0)))
      // doc 2 lives in the other cell: never compared with 1/3/4
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
      // doc 4 compared but under threshold
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    } finally q.stop()
  }

  test("dsirScoreStream: stream scores equal the batch scorer; minLogw gates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static corpus: en-like target slice vs digit noise
    val corpus = ((0 until 6).map(i => (i.toLong, "the cat sat on the mat", "en")) ++
      (6 until 12).map(i => (i.toLong, "111 222 333 444 555", "xx")))
      .toDF("doc_id", "text", "lang")
    val diff = graft.curate.Dsir.fitDiff(corpus, "text", $"lang" === "en",
      buckets = 64)
    val batch = graft.curate.Dsir.importanceWeightsSubset(corpus, "doc_id",
      "text", $"lang" === "en", buckets = 64)
      .as[(Long, Double)].collect().toMap
    val ms = MemoryStream[Doc]
    val out = Streams.dsirScoreStream(ms.toDF(), "text", diff)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream").start()
    try {
      ms.addData(
        Doc(20, ts("2024-01-01 10:00:00"), "the cat sat on the mat"),
        Doc(21, ts("2024-01-01 10:00:01"), "111 222 333 444 555"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, logw FROM dsir_stream")
        .as[(Long, Double)].collect().toMap
      // stream scoring reproduces the batch weights bit-for-bit
      assert(math.abs(rows(20L) - batch(0L)) < 1e-12)
      assert(math.abs(rows(21L) - batch(6L)) < 1e-12)
      assert(rows(20L) > rows(21L), "target-like text must score higher")
    } finally q.stop()
    // the gate form drops below-threshold docs in-flight
    val ms2 = MemoryStream[Doc]
    val gated = Streams.dsirScoreStream(ms2.toDF(), "text", diff,
      minLogw = Some(0.0))
    val q2 = gated.writeStream.outputMode("append")
      .format("memory").queryName("dsir_gated").start()
    try {
      ms2.addData(
        Doc(30, ts("2024-01-01 10:00:00"), "the cat sat on the mat"),
        Doc(31, ts("2024-01-01 10:00:01"), "111 222 333 444 555"))
      q2.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dsir_gated").as[Long].collect().toSet
      assert(kept == Set(30L))
    } finally q2.stop()
  }
}
