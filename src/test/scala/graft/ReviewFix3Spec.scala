package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows
import graft.sources.Fread
import graft.sources.Fread.{FreadOptions, FwriteOptions}
import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Round-2 review-pass regressions (third review batch). */
class ReviewFix3Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("colClasses pins string columns against the multi-NA numeric re-bump") {
    val d = TestTmp.dir("graft_pin")
    val f = d.resolve("t.csv")
    java.nio.file.Files.write(f, "zip,b\n00123,x\nNA,y\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("zip", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
    val df = Fread.fread(spark, f.toString,
      FreadOptions(naStrings = Seq("", "NA", "NULL"), colClasses = Some(schema)))
    assert(df.schema("zip").dataType.typeName == "string")
    assert(df.filter(col("zip") === "00123").count() == 1)   // leading zeros kept
    assert(df.filter(col("zip").isNull).count() == 1)        // extra NA still nulled
  }

  test("fwrite rejects bom with append (gzip composes since round 17)") {
    val df = Seq((1, "x")).toDF("k", "v")
    val dir = TestTmp.dir("graft_bomreq")
    intercept[IllegalArgumentException] {
      Fread.fwrite(df, s"$dir/b", FwriteOptions(bom = true, append = true))
    }
    // bom=TRUE + compress="gzip" is no longer an error: prependBytes
    // streams the BOM through the codec (Round17Spec has the byte-level
    // fixture; this just locks the combination is accepted)
    Fread.fwrite(df.coalesce(1), s"$dir/a",
      FwriteOptions(bom = true, compress = "gzip"))
  }

  test("frollAdaptive: null window length yields null, not a full-frame aggregate") {
    val df = Seq((1, 1.0, Some(1)), (2, 2.0, Some(2)), (3, 3.0, None))
      .toDF("o", "v", "an").withColumn("g", lit("a"))
    val out = df.withColumn("r",
      Windows.frollAdaptive("sum", $"v", $"an", 4, Seq("g"), Seq($"o".asc)))
      .select($"o", $"r").collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(!out(1) && !out(2) && out(3))
  }

  test("dcastMargins: null lhs group still gets its (all) margin") {
    val df = Seq((Some("x"), "p", 1.0), (None, "p", 5.0), (None, "q", 7.0))
      .toDF("lhs", "rhs", "v")
    val out = graft.operators.Reshape.dcastMargins(df, "lhs", "rhs", "v",
      c => sum(c), values = Seq("p", "q"))
    val nullRow = out.filter(col("lhs").isNull).head()
    assert(nullRow.getDouble(nullRow.fieldIndex("(all)")) == 12.0)
  }

  test("TTL as-of: group receiving data after watermark passed its timeout keeps running") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[Ev]
    val src = ms.toDS().withWatermark("ts", "0 seconds").as[Ev]
    val enriched = Streams.asofEnrichStreamTtl(src, "purchase", "click",
      stateTtlMillis = 60 * 1000L)
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("asof_ttl_rearm").start()
    try {
      ms.addData(Ev(1, 7L, ts("2024-01-01 10:00:00"), "purchase", 100.0))
      q.processAllAvailable()
      // other user advances the watermark far past user 7's 10:01 timeout
      ms.addData(Ev(2, 8L, ts("2024-01-01 11:00:00"), "noise", 0.0))
      q.processAllAvailable()
      // user 7 gets a PROBE after the watermark sailed past its state's
      // natural timeout. Two acceptable worlds: the timeout batch already
      // evicted the state (probe emits unenriched), or the probe lands in
      // the same batch the timeout became eligible — where the old code
      // re-armed BELOW the watermark and Spark killed the query. The
      // invariant under test: the query survives and the probe is emitted.
      ms.addData(Ev(3, 7L, ts("2024-01-01 11:00:30"), "click", 0.0))
      q.processAllAvailable()
      assert(q.isActive, s"query died: ${Option(q.exception).map(_.toString)}")
      val row = spark.sql("SELECT last_match FROM asof_ttl_rearm WHERE event_id = 3").head()
      assert(row.isNullAt(0), "state should have expired via the event-time TTL")
    } finally q.stop()
  }
}

/** Arrow-batch decode path parity with the row path. */
class ArrowPathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("extractFeaturesArrow matches the row-wise stub path bit-for-bit") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(100)
    val blobs = graft.mm.Multimodal.blobsFromDocuments(docs)
    val rowPath = graft.mm.Multimodal.extractFeatures(blobs)
      .collect().map(f => f.media_id -> (f.n_bytes, f.features.toSeq)).toMap
    val arrowPath = graft.mm.Multimodal.extractFeaturesArrow(blobs, batchSize = 17)
      .collect().map(f => f.media_id -> (f.n_bytes, f.features.toSeq)).toMap
    assert(arrowPath == rowPath)
    assert(rowPath.size == 100)
  }
}
