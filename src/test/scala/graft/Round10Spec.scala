package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Funcs

/** Round-10: judge + advisor items — week() mode migration parity and
  * the tests.Rraw tranche (dcast drop=FALSE × multiple value.var,
  * rbindlist ignore.attr, foverlaps within × mult, shift give.names).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // class-level: method-local case classes have no Encoder
  case class RDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  // ---- week(mode=) migration (src/idatetime.c:148-173) ----------------

  test("week modes: the reference's own Jan-7 example and edge days") {
    // reference warning text: as.IDate('2023-01-07') is week 2 in
    // legacy mode but week 1 in sequential (week 2 starts on Jan 8)
    val df = Seq("2023-01-01", "2023-01-06", "2023-01-07", "2023-01-08",
      "2023-12-31", "2024-12-31") // 2024 is a leap year: yday 366
      .toDF("d").withColumn("d", to_date(col("d")))
    val got = df.select(col("d").cast("string"),
        Funcs.week(col("d")).as("legacy"),
        Funcs.week(col("d"), "sequential").as("seq"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got("2023-01-01") == ((1, 1)))
    assert(got("2023-01-06") == ((1, 1)))   // yday 6: 6/7+1=1, 5/7+1=1
    assert(got("2023-01-07") == ((2, 1)))   // the migration's example
    assert(got("2023-01-08") == ((2, 2)))
    assert(got("2023-12-31") == ((53, 53))) // yday 365: 52+1 / 52+1
    assert(got("2024-12-31") == ((53, 53))) // yday 366: 366/7+1=53, 365/7+1=53
    intercept[IllegalArgumentException](Funcs.week(col("d"), "iso"))
  }

  // ---- benchGramSet memo (q_curation_pipeline's round-9 regression) ---

  test("benchGramSet is persisted once per (bench, n) and evicted by clearFits") {
    import graft.curate.Contamination
    val bench = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    Contamination.clearFits()
    assert(Contamination.gramSetCount == 0)
    val g1 = Contamination.benchGramSet(bench, "doc_id", "text", n = 3)
    g1.count()
    assert(Contamination.gramSetCount == 1)
    assert(Contamination.gramSetFrames.values.forall(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE))
    // same bench + n → the same memoized frame; different n → a second
    Contamination.benchGramSet(bench, "doc_id", "text", n = 3).count()
    assert(Contamination.gramSetCount == 1)
    Contamination.benchGramSet(bench, "doc_id", "text", n = 2).count()
    assert(Contamination.gramSetCount == 2)
    // the composed path (decontaminate → ngramOverlap) hits the memo too
    val corpus = Seq((10L, "alpha beta gamma delta tail"), (11L, "unrelated words here"))
      .toDF("doc_id", "text")
    val kept = Contamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L))
    assert(Contamination.gramSetCount == 2)
    val frames = Contamination.gramSetFrames.values.toSeq
    Contamination.clearFits()
    assert(Contamination.gramSetCount == 0)
    assert(frames.forall(
      _.storageLevel == org.apache.spark.storage.StorageLevel.NONE))
  }

  // ---- distributed bloom build (giant-bench tier) ----------------------

  test("distributed bloom build == driver bloom == exact overlap; no gram collect") {
    import graft.curate.Contamination
    Contamination.clearFits()
    val corpus = (1L to 200L).map(i =>
      (i, s"doc $i alpha beta ${if (i % 5 == 0) "gamma delta shared tail" else s"unique $i words"}"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "gamma delta shared tail marker"),
      (901L, "totally different eval item")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = norm(Contamination.ngramOverlap(corpus, bench, "doc_id", "text", n = 3))
    val drv = norm(Contamination.ngramOverlapBloom(corpus, bench, "doc_id", "text", n = 3))
    val dist = norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3))
    assert(exact.nonEmpty && exact == drv && exact == dist)
    // an explicit estimate also works (no count job) and stays exact
    Contamination.clearFits()
    val dist2 = norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3, estimatedGrams = 10000L))
    assert(dist2 == exact)
    // the distributed build's fit memoizes like the driver tier's
    val fits = Contamination.bloomFitCount
    norm(Contamination.ngramOverlapBloomDistributed(
      corpus, bench, "doc_id", "text", n = 3, estimatedGrams = 10000L))
    assert(Contamination.bloomFitCount == fits)
  }

  // ---- foverlaps validate=true: eager NA refusal (advisor item) --------

  test("overlap(validate=true) errors eagerly even when NA rows would never evaluate") {
    import graft.operators.Joins
    val x = Seq((1, 5, "a"), (10, 12, "b")).toDF("s", "e", "v")
    val xNa = Seq((Option(1), Option(5), "a"), (Option(10), Option.empty[Int], "b"))
      .toDF("s", "e", "v")
    val y = Seq((2, 4)).toDF("ys", "ye")
    // clean frames pass under validate
    assert(Joins.overlap(x, y, Nil, "s", "e", "ys", "ye",
      autoBin = false, validate = true).count() == 1)
    // the lazy fused guard alone can be bypassed by a pushed filter
    // that removes the NA row before evaluation; validate=true matches
    // the reference's always-errors anyNA semantics
    val ex = intercept[IllegalArgumentException] {
      Joins.overlap(xNa, y, Nil, "s", "e", "ys", "ye",
        autoBin = false, validate = true)
    }
    assert(ex.getMessage.contains("NA values in data.table x 'end' column: 'e'"))
    assert(ex.getMessage.contains("must be removed for foverlaps() to work"))
  }

  // ---- tests.Rraw tranche ---------------------------------------------

  test("dcast drop=FALSE x multiple value.var: full combo grid, per-value columns") {
    import graft.operators.Reshape
    // (2, "q") is never observed; rhs value "y" never occurs with g1=2
    val long = Seq(
      (1, "p", "x", 10.0, 1.0), (1, "p", "y", 20.0, 2.0),
      (1, "q", "x", 30.0, 3.0), (2, "p", "x", 40.0, 4.0))
      .toDF("g1", "g2", "r", "a", "b")
    val wide = Reshape.dcastCompleteMulti(long, Seq("g1", "g2"), "r",
      Seq("a" -> sum(col("a")), "b" -> sum(col("b"))))
    assert(wide.columns.toSet ==
      Set("g1", "g2", "a_x", "b_x", "a_y", "b_y"))
    assert(wide.count() == 4) // 2 x 2 completed combos (reference cj_uniq)
    val m = wide.collect().map(r =>
      (r.getInt(0), r.getString(1)) ->
        Seq("a_x", "b_x", "a_y", "b_y").map(c => Option(r.getAs[Any](c)))).toMap
    assert(m((1, "p")) == Seq(Some(10.0), Some(1.0), Some(20.0), Some(2.0)))
    assert(m((1, "q")) == Seq(Some(30.0), Some(3.0), None, None))
    assert(m((2, "p")) == Seq(Some(40.0), Some(4.0), None, None))
    // the never-observed combo exists with every value column null
    assert(m((2, "q")) == Seq(None, None, None, None))
  }

  test("rbindlist ignore.attr: metadata mismatch refused by default, bound when ignored") {
    import graft.operators.Reshape
    import org.apache.spark.sql.types.MetadataBuilder
    val meta = new MetadataBuilder().putString("units", "seconds").build()
    val d1 = Seq((1, 2.0)).toDF("k", "v")
      .select(col("k"), col("v").as("v", meta))
    val d2 = Seq((2, 3.0)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException](
      Reshape.rbindlist(Seq(d1, d2)))
    assert(ex.getMessage.contains("Class attribute on column 'v' of item 2") &&
      ex.getMessage.contains("ignore.attr=TRUE"))
    val bound = Reshape.rbindlist(Seq(d1, d2), ignoreAttr = true)
    assert(bound.count() == 2)
    // matching attributes bind fine under the default check
    assert(Reshape.rbindlist(Seq(d2, d2)).count() == 2)
  }

  test("foverlaps type=within x mult first/last/all against a quadratic model") {
    import graft.operators.Joins
    val x = Seq((1, 2, 4), (2, 5, 9), (3, 0, 10), (4, 7, 8))
      .toDF("xid", "s", "e")
    val y = Seq((1, 1, 5), (2, 4, 9), (3, 0, 12), (4, 6, 9))
      .toDF("yid", "ys", "ye")
    val xs = Seq((1, 2, 4), (2, 5, 9), (3, 0, 10), (4, 7, 8))
    val yss = Seq((1, 1, 5), (2, 4, 9), (3, 0, 12), (4, 6, 9))
    // model: within = ys <= s && e <= ye, y-match order (ys, ye)
    val model: Map[Int, Seq[Int]] = xs.map { case (xid, s, e) =>
      xid -> yss.filter { case (_, ys, ye) => ys <= s && e <= ye }
        .sortBy { case (yid, ys, ye) => (ys, ye, yid) }.map(_._1)
    }.toMap
    def got(mult: String): Map[Int, Seq[Int]] =
      Joins.overlapMult(x, y, Nil, "s", "e", "ys", "ye",
        typ = "within", mult = mult)
        .select("xid", "yid").collect()
        .groupBy(_.getInt(0)).map { case (k, rs) =>
          k -> rs.map(_.getInt(1)).toSeq.sorted }
    assert(got("all") == model.filter(_._2.nonEmpty)
      .map { case (k, v) => k -> v.sorted })
    val first = Joins.overlapMult(x, y, Nil, "s", "e", "ys", "ye",
      typ = "within", mult = "first").select("xid", "yid").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(first == model.collect { case (k, v) if v.nonEmpty => k -> v.head })
    val last = Joins.overlapMult(x, y, Nil, "s", "e", "ys", "ye",
      typ = "within", mult = "last").select("xid", "yid").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(last == model.collect { case (k, v) if v.nonEmpty => k -> v.last })
  }

  test("shift give.names parity: flip for negative n, lead-with-mixed-signs, shift keeps name") {
    import graft.operators.Windows
    val df = Seq((1, 1.0, 10.0), (2, 2.0, 20.0), (3, 3.0, 30.0))
      .toDF("k", "a", "b")
    val ord = Seq(col("k").asc)
    // lag with ns=(1,-1): negative flips to lead_1 (#3223); two input
    // columns name columns-outer, widths-inner (rep(nx, each=len(n)))
    val lagged = Windows.shiftN(df, Seq("a", "b"), Seq(1, -1), Nil, ord,
      typ = "lag", allowGlobal = true)
    assert(lagged.columns.toSeq.drop(3) ==
      Seq("a_lag_1", "a_lead_1", "b_lag_1", "b_lead_1"))
    val r2 = lagged.filter(col("k") === 2).head()
    assert(r2.getDouble(3) == 1.0 && r2.getDouble(4) == 3.0 &&
      r2.getDouble(5) == 10.0 && r2.getDouble(6) == 30.0)
    // lead with all three signs: n=0 is named lag_0 (#3832) and the
    // negative n computes a LAG
    val led = Windows.shiftN(df, Seq("a"), Seq(-1, 0, 1), Nil, ord,
      typ = "lead", allowGlobal = true)
    assert(led.columns.toSeq.drop(3) == Seq("a_lag_1", "a_lag_0", "a_lead_1"))
    val l2 = led.filter(col("k") === 2).head()
    assert(l2.getDouble(3) == 1.0 && l2.getDouble(4) == 2.0 &&
      l2.getDouble(5) == 3.0)
    // lead without mixed signs keeps lead_0
    assert(Windows.shiftN(df, Seq("a"), Seq(0, 1), Nil, ord, typ = "lead",
      allowGlobal = true).columns.contains("a_lead_0"))
    // type="shift" computes lag but keeps its own name, no flip
    val sh = Windows.shiftN(df, Seq("a"), Seq(1, -1), Nil, ord,
      typ = "shift", allowGlobal = true)
    assert(sh.columns.toSeq.drop(3) == Seq("a_shift_1", "a_shift_-1"))
    val s2 = sh.filter(col("k") === 2).head()
    assert(s2.getDouble(3) == 1.0 && s2.getDouble(4) == 3.0)
  }

  // ---- frollapply with an arbitrary JVM closure (missing #2) -----------

  test("frollApplyF: arbitrary closure over the .SD frame, partial both ways") {
    import graft.operators.Windows
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.DoubleType
    val df = Seq((1, 1.0, 2.0), (2, 3.0, 1.0), (3, 5.0, 3.0), (4, 2.0, 4.0))
      .toDF("k", "p", "q")
    val ord = Seq(col("k").asc)
    // a genuinely non-HOF closure: trimmed weighted mean after sorting
    // the frame by a second column — nothing aggregate/transform express
    val f = (rows: Seq[Row]) => {
      val sorted = rows.map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._2)
      val kept = if (sorted.size > 1) sorted.drop(1) else sorted // trim lowest-q
      kept.map { case (p, q) => p * q }.sum / kept.map(_._2).sum
    }
    val out = Windows.frollApplyF(df, "twm", Seq("p" -> col("p"), "q" -> col("q")),
      3, Nil, ord, f, DoubleType, allowGlobal = true)
      .select(col("k"), col("twm")).collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    // k=3: frame rows (1,2),(3,1),(5,3) sorted by q -> drop (3,1):
    // (1*2 + 5*3)/(2+3) = 3.4 ; k=4: rows (3,1),(5,3),(2,4) drop (3,1):
    // (5*3 + 2*4)/(3+4) = 23/7
    assert(out(1) == None && out(2) == None)
    assert(out(3).exists(v => math.abs(v.asInstanceOf[Double] - 3.4) < 1e-9))
    assert(out(4).exists(v => math.abs(v.asInstanceOf[Double] - 23.0 / 7) < 1e-9))
    // partial=true hands short leading frames to the closure
    val part = Windows.frollApplyF(df, "twm", Seq("p" -> col("p"), "q" -> col("q")),
      3, Nil, ord, f, DoubleType, partial = true, allowGlobal = true)
      .select(col("k"), col("twm")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(part(1) - 1.0) < 1e-9) // 1-row frame kept whole
    assert(math.abs(part(3) - 3.4) < 1e-9) // full frames agree with partial=false
  }

  // ---- RocksDB state store for the streaming gates (stretch) -----------

  test("checkpoint-restart under the RocksDB state store: exactly-once dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    Streams.useRocksDbStateStore(spark)
    try {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      val sink = TestTmp.dir("graft_rocks_sink").toString
      val ckpt = TestTmp.dir("graft_rocks_ckpt").toString
      val ms = MemoryStream[RDoc]
      def start() = Streams.dedupContentStream(ms.toDF(), "ts", "10 seconds", "text")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink).start()
      val q1 = start()
      ms.addData(RDoc(1, t("2024-01-01 10:00:00"), "alpha doc"),
        RDoc(2, t("2024-01-01 10:00:01"), "alpha doc"), // dup of 1
        RDoc(3, t("2024-01-01 10:00:02"), "beta doc"))
      q1.processAllAvailable()
      q1.stop() // kill mid-stream: RocksDB state must restore from ckpt
      // while down: a dup of an ALREADY-SEEN doc (needs restored state
      // to drop) and one novel doc
      ms.addData(RDoc(4, t("2024-01-01 10:00:03"), "beta doc"),
        RDoc(5, t("2024-01-01 10:00:04"), "gamma doc"))
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = spark.read.parquet(sink).select("doc_id")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got == Seq(1L, 3L, 5L), s"across-restart dedup: $got")
      } finally q2.stop()
    } finally Streams.useDefaultStateStore(spark)
  }

  // ---- fcoalesce nan=NA default + frolladapt (NEWS #4567, #3241) -------

  test("fcoalesce: NaN is missing by default; fcoalesceKeepNan keeps it") {
    val d = Seq((Double.NaN, 2.0), (1.0, 9.0), (Double.NaN, Double.NaN))
      .toDF("a", "b")
    val got = d.select(Funcs.fcoalesce($"a", $"b").as("x"),
        Funcs.fcoalesceKeepNan($"a", $"b").as("y"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Double]),
        r.getDouble(1)))
    assert(got(0)._1.contains(2.0) && got(0)._2.isNaN)
    assert(got(1)._1.contains(1.0) && got(1)._2 == 1.0)
    assert(got(2)._1.isEmpty && got(2)._2.isNaN)
  }

  test("frolladapt: rangeBetween counts match the reference's trailing-time rule") {
    import graft.operators.Windows
    // irregular times 0, 5, 6, 20; width 10 → windows {0},{0,5},{0,5,6},{20}
    val d = Seq((1, 0L, 1.0), (1, 5L, 2.0), (1, 6L, 3.0), (1, 20L, 4.0))
      .toDF("g", "t", "v")
    val out = d.withColumn("an", Windows.frolladapt($"t", 10L, Seq("g")))
      .withColumn("s", Windows.frollAdaptive("sum", $"v", $"an", 4,
        Seq("g"), Seq($"t".asc)))
      .orderBy($"t").select($"an", $"s").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1, 1.0), (2, 3.0), (3, 6.0), (1, 4.0)))
    intercept[IllegalArgumentException](Windows.frolladapt($"t", 0L, Seq("g")))
  }

  // ---- merge.data.table surface (R/merge.R) ----------------------------

  test("merge: by.x/by.y keep x's key names; suffixes on clashing payload") {
    val x = DT(Seq((1, "p", 10), (2, "q", 20)).toDF("xid", "tag", "vx"))
    val y = DT(Seq((2, "r", 200), (3, "s", 300)).toDF("yid", "tag", "vy"))
    val m = x.merge(y, byX = Seq("xid"), byY = Seq("yid"))
    assert(m.df.columns.toSeq == Seq("xid", "tag.x", "vx", "tag.y", "vy"))
    assert(m.df.select($"xid").as[Int].collect().toSeq == Seq(2))
    intercept[IllegalArgumentException](x.merge(y, byX = Seq("nope"), byY = Seq("yid")))
    intercept[IllegalArgumentException](x.merge(y, byX = Seq("xid"), byY = Seq()))
  }

  test("merge: all.x/all.y pick the join; default by = shared columns; sort") {
    val x = DT(Seq((2, 20), (1, 10)).toDF("k", "vx"))
    val y = DT(Seq((2, 200), (3, 300)).toDF("k", "vy"))
    def ks(d: DT) = d.df.select($"k").as[Int].collect().toSeq
    assert(ks(x.merge(y)) == Seq(2))
    assert(ks(x.merge(y, allX = true)) == Seq(1, 2))         // sorted
    assert(ks(x.merge(y, allY = true)) == Seq(2, 3))
    assert(ks(x.merge(y, allX = true, allY = true)) == Seq(1, 2, 3))
    assert(x.merge(y, allX = true).key == Seq("k"))
    // sort=FALSE leaves the join order and no key
    assert(x.merge(y, sort = false).key.isEmpty)
  }

  // ---- melt patterns(cols=) (NEWS #6498) -------------------------------

  test("melt patterns(cols=): regex restricted to the candidate subset") {
    import graft.operators.Reshape
    val d = Seq((1, 10, 20, 30)).toDF("id", "y1", "y2", "other2")
    // pattern "2" alone would also catch other2
    val m = Reshape.meltPatterns(d, Seq("id"), "2", cols = Seq("y1", "y2"))
    assert(m.select(col("variable")).distinct()
      .collect().map(_.getString(0)).toSeq == Seq("y2"))
    intercept[IllegalArgumentException] {
      Reshape.meltPatterns(d, Seq("id"), "2", cols = Seq("nope"))
    }
  }

  // ---- fread logicalYN + setcolorder skip_absent (NEWS #4563, #6044) ---

  test("fread(logicalYN): pure Y/N string columns become boolean, mixed stay") {
    import graft.sources.Fread
    val d = TestTmp.dir("graft_yn")
    val p = d.resolve("yn.csv")
    java.nio.file.Files.write(p,
      "id,flag,mixed,empty\n1,Y,Y,\n2,N,maybe,\n3,Y,N,\n".getBytes)
    val off = Fread.fread(spark, p.toString)
    assert(off.schema("flag").dataType.typeName == "string")
    val on = Fread.fread(spark, p.toString,
      Fread.FreadOptions(logicalYN = true))
    assert(on.schema("flag").dataType.typeName == "boolean")
    assert(on.schema("mixed").dataType.typeName == "string")
    // all-null column is NOT logical (no values to witness Y/N)
    assert(on.schema("empty").dataType.typeName != "boolean")
    assert(on.orderBy(col("id")).select(col("flag"))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true, false, true))
  }

  test("setColOrder skip_absent ignores unknown names; default errors") {
    val d = DT(Seq((1, "a", 2.0)).toDF("x", "y", "z"))
    val out = d.setColOrderOpt(Seq("z", "nope", "x"), skipAbsent = true)
    assert(out.df.columns.toSeq == Seq("z", "x", "y"))
    intercept[Exception](d.setColOrderOpt(Seq("z", "nope"))
      .df.columns.toSeq)
  }

  // ---- adaptive align="left" + partial (NEWS #5438) --------------------

  test("frollAdaptive align='left': forward windows; partial trims instead of NA") {
    import graft.operators.Windows
    // the NEWS use case: left-aligned adaptive rolling max
    val d = Seq((1, 1, 5.0, 2), (1, 2, 1.0, 2), (1, 3, 9.0, 2), (1, 4, 2.0, 2))
      .toDF("g", "o", "v", "an")
    def run(partial: Boolean) =
      d.withColumn("m", Windows.frollAdaptive("max", $"v", $"an", 3,
          Seq("g"), Seq($"o".asc), align = "left", partial = partial))
        .orderBy($"o").select($"m").collect().map(r => Option(r.get(0)))
    // windows forward: [5,1]→5, [1,9]→9, [9,2]→9, [2]→incomplete
    assert(run(partial = false).toSeq ==
      Seq(Some(5.0), Some(9.0), Some(9.0), None))
    assert(run(partial = true).toSeq ==
      Seq(Some(5.0), Some(9.0), Some(9.0), Some(2.0)))
    intercept[IllegalArgumentException] {
      d.withColumn("m", Windows.frollAdaptive("max", $"v", $"an", 3,
        Seq("g"), Seq($"o".asc), align = "center"))
    }
  }

  // ---- 1.18.4 regression locks ----------------------------------------

  test("non-equi join: equality + two inequalities on one column (#7641)") {
    import graft.operators.Joins
    val x = Seq((1, 5), (1, 15), (2, 10)).toDF("id", "v")
    val bands = Seq((1, 0, 10), (2, 20, 30)).toDF("id", "lo", "hi")
    // on = .(id == id, v >= lo, v <= hi)
    val out = x.alias("x").join(bands.alias("b"),
        col("x.id") === col("b.id") &&
          col("x.v") >= col("b.lo") && col("x.v") <= col("b.hi"), "inner")
      .select(col("x.id"), col("x.v")).collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq == Seq((1, 5)))
    // and through the DT theta-join surface
    val dtOut = DT(x).joinExpr(DT(bands),
        x("id") === bands("id") && x("v") >= bands("lo") && x("v") <= bands("hi"),
        "inner").df.count()
    assert(dtOut == 1)
  }

  test("frollapply window longer than input: output length == input length (#7646)") {
    import graft.operators.Windows
    val d = Seq((1, 1, 2.0), (1, 2, 3.0)).toDF("g", "o", "v")
    val arr = Windows.frollWindowArray($"v", 5, Seq("g"), Seq($"o".asc))
    val out = d.withColumn("w", when(size(arr) === 5, array_max(arr)))
    assert(out.count() == 2)
    assert(out.select($"w").collect().forall(_.isNullAt(0)))
  }

  // ---- dev-NEWS tranche: .ROW := NULL, tstrsplit(rev=), give.names= ----

  test("deleteRows: DT[i, .ROW := NULL] — NA predicate rows survive, key cleared") {
    val d = DT(Seq((1, Some(10)), (2, None), (3, Some(30))).toDF("id", "v"),
      Seq("id"))
    val out = d.deleteRows($"v" > 15)
    assert(out.df.orderBy($"id").select($"id").as[Int].collect().toSeq == Seq(1, 2))
    assert(out.key.isEmpty, "reference clears keys/indices after row deletion")
  }

  test("tstrsplit rev=TRUE: positions anchor from the end of each string") {
    import graft.operators.Reshape
    val d = Seq("a.b.c", "x.y", "solo").toDF("s")
    val out = Reshape.tstrsplit(d, "s", "\\.", 2, rev = true)
      .orderBy($"s").select($"V1", $"V2").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    // V1 = last part, V2 = second-to-last (null when absent)
    assert(out.toSeq == Seq(("c", Some("b")), ("solo", None), ("y", Some("x"))))
  }

  test("frollN give.names as a character vector") {
    import graft.operators.Windows
    val d = Seq((1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0)).toDF("g", "o", "v")
    val out = Windows.frollN(d, "r", "sum", $"v", Seq(2, 3),
      Seq("g"), Seq($"o".asc), names = Seq("short", "long"))
    assert(out.columns.takeRight(2).toSeq == Seq("short", "long"))
    intercept[IllegalArgumentException] {
      Windows.frollN(d, "r", "sum", $"v", Seq(2, 3),
        Seq("g"), Seq($"o".asc), names = Seq("only_one"))
    }
  }

  // ---- split.data.table keep.by / sorted (R/data.table.R:2684) ---------

  test("splitBy keep.by=FALSE drops the split columns; sorted orders pieces") {
    val d = DT(Seq(("b", 1), ("a", 2), ("b", 3)).toDF("g", "v"))
    val parts = d.splitBy(Seq("g"), keepBy = false, sorted = true)
    assert(parts.keys.toSeq == Seq(Seq("a"), Seq("b")))
    assert(parts(Seq("a")).df.columns.toSeq == Seq("v"))
    assert(parts(Seq("b")).df.count() == 2)
    val kept = d.splitBy(Seq("g"))
    assert(kept(Seq("a")).df.columns.toSeq == Seq("g", "v"))
  }

  // ---- yearmon/yearqtr character format (R/IDateTime.R:413-435) --------

  test("yearmon/yearqtr format='character': the reference's sprintf labels") {
    val d = Seq("2024-03-15", "2024-10-01").toDF("d")
      .withColumn("d", to_date(col("d")))
    val got = d.select(
        Funcs.yearmon($"d", "character").as("ym"),
        Funcs.yearqtr($"d", "character").as("yq"),
        Funcs.yearmon($"d").as("ymn"),
        Funcs.yearqtr($"d").as("yqn"))
      .orderBy($"ym").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024M03", "2024Q1", 2024.0 + 2.0 / 12, 2024.0),
      ("2024M10", "2024Q4", 2024.0 + 9.0 / 12, 2024.75)))
    intercept[IllegalArgumentException](Funcs.yearmon($"d", "bad"))
  }

  // ---- groupingsets id=TRUE (R/groupingsets.R:124-161) -----------------

  test("groupingsets id=TRUE: leading grouping bit-mask column, name guards") {
    val d = DT(Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3))
      .toDF("g1", "g2", "v"))
    val out = d.groupingSetsAgg(
        Seq("g1" -> $"g1", "g2" -> $"g2"),
        Seq(Seq("g1", "g2"), Seq("g1"), Seq.empty),
        Seq(sum($"v").as("s")), id = true).df
    assert(out.columns.head == "grouping")
    val byId = out.collect().groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    // 0 = fully grouped (3 combos), 1 = g2 rolled up (2 rows), 3 = total
    assert(byId == Map(0 -> 3, 1 -> 2, 3 -> 1))
    // the reference refuses an input column named 'grouping' under id=TRUE
    intercept[IllegalArgumentException] {
      DT(Seq((1, 2)).toDF("grouping", "v"))
        .groupingSetsAgg(Seq("v" -> $"v"), Seq(Seq("v")),
          Seq(count(lit(1)).as("n")), id = true)
    }
    intercept[IllegalArgumentException] {
      d.groupingSetsAgg(Seq("g1" -> $"g1"), Seq(Seq("g1")),
        Seq(count(lit(1)).as("grouping")), id = true)
    }
  }

  // ---- mergelist.Rraw tranche (R/mergelist.R parity) -------------------

  test("mergelist mult defaults per how: left/inner/full/right refuse multiplying matches") {
    import graft.operators.Joins
    // 102.631: default mult is 'error' — dup division_id must refuse
    val fact = Seq((1, 1), (2, 2)).toDF("id", "div")
    val divDup = Seq((1, 10), (1, 11), (2, 20)).toDF("div", "region")
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(fact, divDup),
        Seq(Joins.MergeStep(Seq("div")))).collect()
    }
    // 102.632: mult='all' opts into the explosion (3 rows here)
    val all = Joins.mergelistSteps(Seq(fact, divDup),
      Seq(Joins.MergeStep(Seq("div"), mult = "all")))
    assert(all.count() == 3)
    // semi/anti resolve mult='last' and never refuse dups
    val semi = Joins.mergelistSteps(Seq(fact, divDup),
      Seq(Joins.MergeStep(Seq("div"), "semi")))
    assert(semi.count() == 2)
  }

  test("mergelist mult='error' checks BOTH sides for inner/full (101.38)") {
    import graft.operators.Joins
    // LHS has the dup, RHS unique: reference's full-join error covers it
    val lhsDup = Seq((3, 1), (2, 2), (2, 3)).toDF("id1", "v1")
    val rhsUniq = Seq((2, 2), (1, 3)).toDF("id1", "v2")
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(lhsDup, rhsUniq),
        Seq(Joins.MergeStep(Seq("id1"), "full", "error"))).collect()
    }
    // but a LEFT join only asserts the RHS (bmerge checks only x)
    val left = Joins.mergelistSteps(Seq(lhsDup, rhsUniq),
      Seq(Joins.MergeStep(Seq("id1"), "left", "error")))
    assert(left.count() == 3)
  }

  test("mergelist mult applies to the LOOKUP side: LHS for how='right' (other.Rraw sql tester)") {
    import graft.operators.Joins
    val lhsDup = Seq((1, "a1"), (1, "a2"), (2, "b")).toDF("k", "lv")
    val rhs = Seq((1, "x"), (3, "z")).toDF("k", "rv")
    // right join: multiplying matches come from the LHS — default
    // mult='error' must refuse them...
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(lhsDup, rhs),
        Seq(Joins.MergeStep(Seq("k"), "right")))
    }
    // ...and mult='first' dedups the LHS, keeping every RHS row
    val first = Joins.mergelistSteps(Seq(lhsDup, rhs),
        Seq(Joins.MergeStep(Seq("k"), "right", "first")))
      .orderBy($"k").collect()
      .map(x => (x.getInt(0), Option(x.getString(1)), x.getString(2)))
    assert(first.toSeq == Seq((1, Some("a1"), "x"), (3, None, "z")))
    // while a dup RHS is fine for how='right' under the default
    val rhsDup = Seq((1, "x1"), (1, "x2")).toDF("k", "rv")
    val lhsU = Seq((1, "a")).toDF("k", "lv")
    assert(Joins.mergelistSteps(Seq(lhsU, rhsDup),
      Seq(Joins.MergeStep(Seq("k"), "right"))).count() == 2)
  }

  test("mergelist mult=first/last dedups BOTH sides for inner (R/mergelist.R:174)") {
    import graft.operators.Joins
    val l = Seq((1, "a1"), (1, "a2"), (2, "b1")).toDF("k", "lv")
    val r = Seq((1, "x1"), (1, "x2"), (3, "z1")).toDF("k", "rv")
    val first = Joins.mergelistSteps(Seq(l, r),
        Seq(Joins.MergeStep(Seq("k"), "inner", "first")))
      .orderBy($"k").collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    assert(first.toSeq == Seq((1, "a1", "x1")))
    val last = Joins.mergelistSteps(Seq(l, r),
        Seq(Joins.MergeStep(Seq("k"), "inner", "last")))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    assert(last.toSeq == Seq((1, "a2", "x2")))
  }

  test("mergelist guards: cross arg combos, semi+all, join.many=FALSE m2m refusal") {
    import graft.operators.Joins
    val a = Seq(Tuple1(1)).toDF("x")
    val b = Seq(Tuple1(1)).toDF("y")
    // 101.02/32/33
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(a, b), Seq(Joins.MergeStep(Seq("y"), "cross")))
    }
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(a, b), Seq(Joins.MergeStep(Nil, "cross", "first")))
    }
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(a, b),
        Seq(Joins.MergeStep(Nil, "cross", joinMany = false)))
    }
    assert(Joins.mergelistSteps(Seq(a, b),
      Seq(Joins.MergeStep(Nil, "cross"))).count() == 1)
    // 101.34/35
    val k1 = Seq(Tuple1(1)).toDF("x")
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(k1, k1), Seq(Joins.MergeStep(Seq("x"), "semi", "all")))
    }
    // join.many=FALSE refuses a genuine many-to-many; 1:many passes
    val dup = Seq((1, "p"), (1, "q")).toDF("k", "v")
    val dup2 = Seq((1, "r"), (1, "s")).toDF("k", "w")
    val uniq = Seq((1, "u")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(dup, dup2),
        Seq(Joins.MergeStep(Seq("k"), "inner", "all", joinMany = false))).collect()
    }
    assert(Joins.mergelistSteps(Seq(dup, uniq),
      Seq(Joins.MergeStep(Seq("k"), "inner", "all", joinMany = false))).count() == 2)
  }

  test("mergelist cols= selects the incoming table's payload, keys always kept (103.2x)") {
    import graft.operators.Joins
    val l = Seq((1, 10, 20), (2, 11, 21)).toDF("id1", "v1", "v2")
    val r = Seq((2, 30, 40), (3, 31, 41)).toDF("id1", "v3", "v4")
    val out = Joins.mergelistSteps(Seq(l, r),
      Seq(Joins.MergeStep(Seq("id1"), "left", cols = Some(Seq("v3")))))
    assert(out.columns.toSeq == Seq("id1", "v1", "v2", "v3"))
    intercept[IllegalArgumentException] {
      Joins.mergelistSteps(Seq(l, r),
        Seq(Joins.MergeStep(Seq("id1"), "left", cols = Some(Seq("v5")))))
    }
  }

  // ---- dev-NEWS tranche 2: #4888/#4891 dup-name guards, #7281 date
  // bounds, #3992 typed nafill, #5489 reverse frank, check= ------------

  test("setNames guards: dup old, absent old (skipAbsent), key-dup result (#4888)") {
    val d = DT(Seq((1, 2, 3)).toDF("a", "b", "c"))
    // duplicated 'old' refuses
    val e1 = intercept[IllegalArgumentException] {
      d.setNames("a" -> "x", "a" -> "y") }
    assert(e1.getMessage.contains("duplicates exist in 'old'"))
    // absent 'old' refuses, names the offender, suggests skip_absent
    val e2 = intercept[IllegalArgumentException] { d.setNames("zz" -> "x") }
    assert(e2.getMessage.contains("not found in column names") &&
      e2.getMessage.contains("zz") && e2.getMessage.contains("skip_absent"))
    // skipAbsent applies the resolvable renames and drops the rest
    val ok = d.setNamesOpt(Seq("zz" -> "x", "a" -> "a2"), skipAbsent = true)
    assert(ok.df.columns.toSeq == Seq("a2", "b", "c"))
    // a rename that collides with the KEY refuses; payload collision passes
    val keyed = DT(Seq((1, 2, 3)).toDF("a", "b", "c"), Seq("a"))
    val e3 = intercept[IllegalArgumentException] { keyed.setNames("b" -> "a") }
    assert(e3.getMessage.contains("duplicated key columns"))
    assert(d.setNames("b" -> "c").df.columns.count(_ == "c") == 2)
  }

  test("keyBy guards: missing col, duplicate ask, dup names in x (#4891)") {
    val d = DT(Seq((1, 2)).toDF("a", "b"))
    val e1 = intercept[IllegalArgumentException] { d.keyBy("nope") }
    assert(e1.getMessage.contains("not in the data.table"))
    val e2 = intercept[IllegalArgumentException] { d.keyBy("a", "a") }
    assert(e2.getMessage.contains("duplicate column names"))
    // Spark tolerates dup names after a raw select; keying on one refuses
    val dup = DT(Seq((1, 2)).toDF("a", "b").select(col("a"), col("b").as("a")))
    val e3 = intercept[IllegalArgumentException] { dup.keyBy("a") }
    assert(e3.getMessage.contains("duplicated column names in the columns to key by"))
  }

  test("CJ refuses duplicated column names when keyed; CJopt(sorted=FALSE) allows") {
    val e = intercept[IllegalArgumentException] {
      DT.CJ(spark, "x" -> Seq(1, 2), "x" -> Seq(3)) }
    assert(e.getMessage.contains("duplicated column names"))
    // sorted=FALSE result is unkeyed, mirrors the reference allowing dups there
    val un = DT.CJopt(spark, sorted = false, unique = false)(
      "x" -> Seq(1, 2), "x" -> Seq(3))
    assert(un.df.count() == 2 && un.df.columns.toSeq == Seq("x", "x"))
  }

  test("between on Date bounds: NA bound unbounded (#7281); check= raises on lower>upper") {
    val d = Seq(("1995-01-01", 1), ("1996-07-01", 2), ("1994-02-01", 3))
      .toDF("s", "id").withColumn("d", col("s").cast("date"))
    val lo = lit("1995-01-01").cast("date")
    val hi = lit("1996-01-01").cast("date")
    val in = d.withColumn("b", Funcs.between(col("d"), lo, hi))
      .orderBy("id").select("b").as[Boolean].collect().toSeq
    assert(in == Seq(true, false, false))
    val nab = d.withColumn("b", Funcs.betweenNA(col("d"), lo, lit(null).cast("date")))
      .orderBy("id").select("b").as[Boolean].collect().toSeq
    assert(nab == Seq(true, true, false))
    // check=TRUE: reversed bounds raise (src/between.c:83)
    val err = intercept[Exception] {
      d.withColumn("b", Funcs.between(col("d"), hi, lo, check = true)).collect()
    }
    assert(err.getMessage.contains("greater than upper"))
    // check=TRUE with sane bounds is a no-op
    assert(d.withColumn("b", Funcs.between(col("d"), lo, hi, check = true))
      .filter(col("b")).count() == 1)
  }

  test("nafill family is type-generic: character, date, boolean (#3992)") {
    import graft.operators.Windows
    val d = Seq(
      (1, 1, Some("a"), Some("2024-01-01"), Some(true)),
      (1, 2, None: Option[String], None: Option[String], None: Option[Boolean]),
      (1, 3, Some("b"), Some("2024-01-03"), Some(false)),
      (1, 4, None: Option[String], None: Option[String], None: Option[Boolean]))
      .toDF("g", "i", "s", "dstr", "fl")
      .withColumn("dd", col("dstr").cast("date"))
    val ord = Seq(col("i").asc)
    val out = d
      .withColumn("s_locf", Windows.nafillLocf(col("s"), Seq("g"), ord))
      .withColumn("d_nocb", Windows.nafillNocb(col("dd"), Seq("g"), ord))
      .withColumn("f_const", Windows.nafillConst(col("fl"), lit(false)))
      .orderBy("i")
    val rows = out.select("s_locf", "d_nocb", "f_const").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "a", "b", "b"))
    assert(rows.map(r => Option(r.getDate(1)).map(_.toString).orNull).toSeq ==
      Seq("2024-01-01", "2024-01-03", "2024-01-03", null))
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(true, false, false, false))
  }

  test("setorderNa: double asc then non-double desc keeps na.last (#7875 lock)") {
    val d = Seq(
      (Some(1.0), Some("b")), (Some(1.0), None: Option[String]),
      (None: Option[Double], Some("a")), (Some(2.0), Some("a")))
      .toDF("x", "y")
    val out = DT(d).setorderNa(Seq(("x", true), ("y", false)), naLast = true)
      .df.collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    // x asc (NA last), then y desc with NA last within the x=1.0 block
    assert(out == Seq(
      (Some(1.0), Some("b")), (Some(1.0), None),
      (Some(2.0), Some("a")), (None, Some("a"))))
  }
}
