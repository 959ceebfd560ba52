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

  test("hashSample is deterministic, content-addressed, and rate-monotone") {
    val df = (0 until 1000).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
    val s1 = graft.curate.Sampling.hashSample(df, col("text"), 0.3)
      .select("id").as[Long].collect().toSet
    val s2 = graft.curate.Sampling.hashSample(df.repartition(7), col("text"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "decision must not depend on partitioning")
    val bigger = graft.curate.Sampling.hashSample(df, col("text"), 0.6)
      .select("id").as[Long].collect().toSet
    assert(s1.subsetOf(bigger), "raising the rate must keep every previously-kept row")
    assert(s1.nonEmpty && s1.size < 1000)
    // growing the corpus keeps prior decisions (content-addressed)
    val grown = df.union(Seq((9999L, "a brand new doc")).toDF("id", "text"))
    val s3 = graft.curate.Sampling.hashSample(grown, col("text"), 0.3)
      .select("id").as[Long].collect().toSet
    assert((s3 - 9999L) == s1 || s3 == s1)
  }

  test("stratifiedHashSample applies per-stratum rates with a default") {
    val df = (0 until 600).map(i =>
      (i.toLong, s"text $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("id", "text", "lang")
    val out = graft.curate.Sampling.stratifiedHashSample(df, col("text"), "lang",
      Map("en" -> 0.0, "zh" -> 1.0), default = 0.5)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains("en"), "rate 0 keeps nothing")
    assert(byLang("zh") == 200L, "rate 1 keeps everything")
    assert(byLang.get("fr").exists(n => n > 0 && n < 200), "default rate is partial")
  }

  test("canonicalize strips case/punct/spacing; exactCanonical groups on it") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD"),
      (4L, "different doc")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.exactCanonical(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (4L, 1L)))
  }

  test("roundIDate truncates to DATE-typed period starts; rejects bad units") {
    val df = Seq("2001-03-17 10:30:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val r = df.select(
      graft.functions.Funcs.roundIDate($"ts", "week").as("w"),
      graft.functions.Funcs.roundIDate($"ts", "month").as("m"),
      graft.functions.Funcs.roundIDate($"ts", "quarter").as("q"),
      graft.functions.Funcs.roundIDate($"ts", "year").as("y"))
    assert(r.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.DateType))
    val row = r.head()
    assert(row.getDate(0).toString == "2001-03-12")  // Monday
    assert(row.getDate(1).toString == "2001-03-01")
    assert(row.getDate(2).toString == "2001-01-01")
    assert(row.getDate(3).toString == "2001-01-01")
    intercept[IllegalArgumentException] {
      graft.functions.Funcs.roundIDate($"ts", "fortnight")
    }
  }

  test("dedupContentStream drops canonical duplicates within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = ms.toDS().toDF("doc_id", "ts", "text")
    val out = graft.streaming.Streams.dedupContentStream(
      src, "ts", "10 minutes", "text", canonical = true)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      ms.addData(
        (1L, ts("2024-01-01 10:00:00"), "Hello, World!"),
        (2L, ts("2024-01-01 10:00:05"), "hello   world"),   // canonical dup of 1
        (3L, ts("2024-01-01 10:00:10"), "another doc"))
      q.processAllAvailable()
      ms.addData(
        (4L, ts("2024-01-01 10:01:00"), "HELLO-WORLD"))     // still inside horizon
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dedup_stream")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"expected canonical dups dropped, got $kept")
    } finally q.stop()
  }

  test("startsWithAny matches any literal prefix") {
    val df = Seq("blue bolt", "red widget", "green gear").toDF("s")
    val got = df.filter(graft.functions.Funcs.startsWithAny($"s", Seq("blue", "red")))
      .as[String].collect().toSet
    assert(got == Set("blue bolt", "red widget"))
  }

  test("packByBudget: sequences average the budget, shards pack independently") {
    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 100)).toDF("id", "shard", "n")
    val out = graft.curate.Packing.packByBudget(df, col("n"), budget = 500L,
      shard = Seq("shard"), order = Seq(col("id")))
    // 50 docs x 100 tokens per shard / 500 budget = 10 sequences of 5 docs
    val sizes = out.groupBy("shard", "seq_id").count()
      .as[(String, Long, Long)].collect()
    assert(sizes.length == 20)
    assert(sizes.forall(_._3 == 5L), s"expected 5 docs/sequence: ${sizes.toSeq}")
    // deterministic: same input, same assignment
    val again = graft.curate.Packing.packByBudget(df, col("n"), 500L,
      Seq("shard"), Seq(col("id")))
    assert(out.orderBy("id").collect().toSeq == again.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      graft.curate.Packing.packByBudget(df, col("n"), 500L, Nil, Seq(col("id")))
    }
  }

  test("chunksFixed: exact cover, remainder tail, empty text keeps one chunk") {
    val df = Seq(
      (1L, "a" * 250),   // 3 chunks: 100+100+50
      (2L, "b" * 200),   // exact multiple: 2 chunks
      (3L, "")           // one empty chunk
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      posexplode(graft.text.TextFunctions.chunksFixed($"text", 100))
        .as(Seq("chunk_id", "chunk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2).length))
    assert(out.count(_._1 == 1L) == 3)
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(100, 100, 50))
    assert(out.count(_._1 == 2L) == 2)
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(100, 100))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0)))
    // reassembly round-trips
    val glued = df.select($"doc_id",
      concat_ws("", graft.text.TextFunctions.chunksFixed($"text", 100)).as("t2"))
      .join(df, "doc_id").filter($"t2" =!= $"text").count()
    assert(glued == 0)
    intercept[IllegalArgumentException] {
      graft.text.TextFunctions.chunksFixed($"text", 0)
    }
  }

  test("roundMantissa: FP-noise keys join under 1-2 byte rounding, distinct values stay distinct") {
    // the reference's motivating FP-noise case (man/setNumericRounding.Rd
    // shape): 0.1 + 0.2 != 0.3 at full precision
    val noisy = 0.1 + 0.2
    assert(noisy != 0.3)
    val df = Seq(("a", noisy), ("b", 0.3), ("c", 0.30001)).toDF("k", "v")
    def groupsAt(bytes: Int): Long =
      df.select(graft.functions.Funcs.roundMantissa($"v", bytes).as("r"))
        .distinct().count()
    assert(groupsAt(0) == 3, "0 bytes = full precision (default off)")
    assert(groupsAt(2) == 2, "2-byte rounding merges the FP-noise pair only")
    // joins: rounded equality matches the noisy pair, not the distinct one
    val l = Seq(("a", noisy)).toDF("lk", "lv")
    val r = Seq(("b", 0.3), ("c", 0.30001)).toDF("rk", "rv")
    val m = l.join(r, graft.functions.Funcs.roundedEqual($"lv", $"rv", 2))
      .select("rk").as[String].collect().toSeq
    assert(m == Seq("b"))
    // NaN / infinities pass through unchanged
    val special = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("v").select(graft.functions.Funcs.roundMantissa($"v", 2).as("r"))
      .collect().map(_.getDouble(0))
    assert(special(0).isNaN && special(1).isPosInfinity && special(2).isNegInfinity)
    // finite values never round INTO Inf (MaxValue's all-ones significand
    // would carry into the Inf exponent; we truncate there instead)
    val maxR = Seq(Double.MaxValue, Double.MinValue)
      .toDF("v").select(graft.functions.Funcs.roundMantissa($"v", 2).as("r"))
      .collect().map(_.getDouble(0))
    assert(maxR.forall(d => !d.isInfinite), s"finite keys leaked to Inf: ${maxR.toSeq}")
    intercept[IllegalArgumentException] {
      graft.functions.Funcs.roundMantissa($"v", 3)
    }
  }

  test("dcastMarginsN emits every lhs prefix level plus the (all) column") {
    val df = Seq(
      ("a", "x", "F", 1.0), ("a", "x", "O", 2.0), ("a", "y", "F", 3.0),
      ("b", "x", "O", 4.0)).toDF("k1", "k2", "st", "v")
    val out = graft.operators.Reshape.dcastMarginsN(df, Seq("k1", "k2"), "st",
      "v", c => sum(c), values = Seq("F", "O"))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(rows.contains(("a", "x", Some(1.0), Some(2.0), Some(3.0))))
    assert(rows.contains(("a", "(all)", Some(4.0), Some(2.0), Some(6.0))))
    assert(rows.contains(("(all)", "(all)", Some(4.0), Some(6.0), Some(10.0))))
    // string-typed lhs is required for the label fill
    intercept[IllegalArgumentException] {
      graft.operators.Reshape.dcastMarginsN(
        df.withColumn("k1", lit(1)), Seq("k1", "k2"), "st", "v", c => sum(c))
    }
  }
}
