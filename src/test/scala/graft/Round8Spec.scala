package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reshape

/** Round-8: melt measure(fun=) type dispatch (R/fmelt.R:133-153) and
  * the DSIR value-histogram selection tier.
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val wide = Seq((1, 10.0, 20.0, 0.1, 0.2))
    .toDF("id", "a_1", "a_2", "b_1", "b_2")

  test("measure(fun=) converts a dim group to a typed column") {
    val long = Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
      Seq("value.name", "dim"),
      convert = Map("dim" -> ((d: String) => d.toInt)))
    assert(long.schema("dim").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = long.orderBy($"dim")
      .select($"dim", $"a", $"b").as[(Int, Double, Double)].collect().toSeq
    assert(rows == Seq((1, 10.0, 0.1), (2, 20.0, 0.2)))
  }

  test("measure(sep=, fun=): literal-sep split form, off-width columns ignored") {
    val df = Seq((1, 10.0, 20.0, 7.0)).toDF("id", "a_1", "a_2", "ignored")
    val long = Reshape.meltMeasureSepN(df, Seq("id"), "_",
      Seq("value.name", "dim"),
      convert = Map("dim" -> ((d: String) => d.toLong)))
    assert(long.columns.toSeq == Seq("id", "dim", "a"))
    assert(long.orderBy($"dim").select($"dim", $"a")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 10.0), (2L, 20.0)))
  }

  test("measure(fun=) error paths: all-null, collision, non-string value.name") {
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("dim" -> ((_: String) => null)))
    }
    // converting both suffixes to the same value collides post-conversion
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("dim" -> ((_: String) => 1)))
    }
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("value.name" -> ((_: String) => 2)))
    }
    intercept[IllegalArgumentException] {
      Reshape.meltMeasureN(wide, Seq("id"), "^([ab])_(\\d+)$",
        Seq("value.name", "dim"),
        convert = Map("nope" -> ((d: String) => d)))
    }
  }

  test("dsir subset fast path == general importanceWeights on a subset target") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"), (2L, "dog runs fast", "en"),
      (3L, "111 222 333", "xx"), (4L, "", "xx"),
      (5L, "the the the", "en"), (6L, "mixed 111 cat", "xx"))
      .toDF("doc_id", "text", "lang")
    val general = graft.curate.Dsir.importanceWeights(docs, "doc_id", "text",
      docs.filter($"lang" === "en"), "text", buckets = 32)
      .select($"doc_id", round($"logw", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    val fast = graft.curate.Dsir.importanceWeightsSubset(docs, "doc_id",
      "text", $"lang" === "en", buckets = 32)
      .select($"doc_id", round($"logw", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    assert(fast.keySet == general.keySet)
    for ((k, v) <- general)
      assert(math.abs(fast(k) - v) < 1e-9, s"doc $k: ${fast(k)} vs $v")
  }

  test("dsir selectAtLeast keeps >= n docs, closed under weight ties") {
    // corpus: 6 en-like docs, 6 digit docs; target = the en-like half
    val docs = (0 until 6).map(i => (i.toLong, "the cat sat on the mat", "en")) ++
      (6 until 12).map(i => (i.toLong, "111 222 333 444 555", "xx"))
    val df = docs.toDF("doc_id", "text", "lang")
    val sel = graft.curate.Dsir.selectAtLeast(df, "doc_id", "text",
      df.filter($"lang" === "en"), "text", n = 2, buckets = 64)
    val ids = sel.select($"doc_id").as[Long].collect().toSet
    // all six en docs tie on the same weight; the threshold keeps the
    // whole tie class, never a partial cut
    assert(ids == (0L until 6L).toSet)
    // n larger than the corpus → everything kept via the -inf fallback
    val all = graft.curate.Dsir.selectAtLeast(df, "doc_id", "text",
      df.filter($"lang" === "en"), "text", n = 100, buckets = 64)
    assert(all.count() == 12)
  }

  // ---- reference-test ports (round-7 verdict item 7) ---------------------

  // tests.Rraw 918/919 (#2453): NA in a double join column is an ordinary
  // joinable value to bmerge; unmatched NA keys survive outer joins with
  // their key intact.
  private lazy val naX = Seq(
    ("Joh", Option.empty[Double]), ("Raf", Some(31.0)), ("Jon", Some(33.0)),
    ("Ste", Some(33.0)), ("Rob", Some(34.0)), ("Smi", Some(34.0)))
    .toDF("name", "depID")
  private lazy val naY = Seq((31.0, "Sal"), (33.0, "Eng"), (34.0, "Cle"), (35.0, "Mar"))
    .toDF("depID", "depName")

  test("NA join keys: Y[X] keeps the NA probe row with its null key (tests.Rraw 918)") {
    // Y[X]: every X row drives the result — right join in x=Y orientation
    val out = DT(naY).join(DT(naX), Seq("depID"), "right", nullSafe = true)
      .df.orderBy($"name").select($"name", $"depID", $"depName")
      .as[(String, Option[Double], Option[String])].collect().toSeq
    assert(out == Seq(
      ("Joh", None, None), ("Jon", Some(33.0), Some("Eng")),
      ("Raf", Some(31.0), Some("Sal")), ("Rob", Some(34.0), Some("Cle")),
      ("Smi", Some(34.0), Some("Cle")), ("Ste", Some(33.0), Some("Eng"))))
  }

  test("NA join keys: X[Y] right join carries i-side keys for unmatched probes (tests.Rraw 919)") {
    val out = DT(naX).join(DT(naY), Seq("depID"), "right", nullSafe = true)
      .df.orderBy($"depID", $"name").select($"depID", $"name", $"depName")
      .as[(Double, Option[String], String)].collect().toSeq
    // depID 35.0 has no X match: before the round-8 collapse fix its key
    // column came out null (x side only); bmerge keeps 35 (test 919's
    // last row is depID=35, name=NA, depName="Mar")
    assert(out == Seq(
      (31.0, Some("Raf"), "Sal"), (33.0, Some("Jon"), "Eng"),
      (33.0, Some("Ste"), "Eng"), (34.0, Some("Rob"), "Cle"),
      (34.0, Some("Smi"), "Cle"), (35.0, None, "Mar")))
  }

  test("NA join keys: NA matches NA across sides; semi join admits the NA row") {
    val y2 = naY.unionByName(
      Seq((Option.empty[Double], "Unk")).toDF("depID", "depName"))
    val full = DT(naX).join(DT(y2), Seq("depID"), "full", nullSafe = true).df
    val johRow = full.filter($"name" === "Joh")
      .select($"depID", $"depName").as[(Option[Double], String)].collect().toSeq
    assert(johRow == Seq((None, "Unk"))) // NA<=>NA matched, key stays null
    val semi = DT(naX).join(DT(y2), Seq("depID"), "left_semi", nullSafe = true)
      .df.select($"name").as[String].collect().toSet
    assert(semi == Set("Joh", "Raf", "Jon", "Ste", "Rob", "Smi"))
    val anti = DT(naX).join(DT(y2), Seq("depID"), "left_anti", nullSafe = true)
      .df.count()
    assert(anti == 0)
  }

  // bmerge's roll with duplicate on-values: binary search lands at the
  // END of a run of duplicates, so LOCF carries the LAST duplicate in
  // table order (and NOCB the first). tieBreak pins that order.
  test("roll join duplicate on-values: LOCF carries the last duplicate, NOCB the first") {
    import graft.operators.Joins
    val x = Seq(("a", 1.0, 1L, 10.0), ("a", 1.0, 2L, 20.0), ("a", 3.0, 3L, 30.0))
      .toDF("id", "ts", "seq", "v")
    val i = Seq(("a", 0.5), ("a", 1.0), ("a", 2.0), ("a", 3.5)).toDF("id", "ts")
    val locf = Joins.asof(x, i, Seq("id"), "ts", Joins.Locf, tieBreak = Seq("seq"))
      .orderBy($"ts").select($"ts", $"v").as[(Double, Option[Double])].collect().toSeq
    assert(locf == Seq((0.5, None), (1.0, Some(20.0)), (2.0, Some(20.0)), (3.5, Some(30.0))))
    val nocb = Joins.asof(x, i, Seq("id"), "ts", Joins.Nocb, tieBreak = Seq("seq"))
      .orderBy($"ts").select($"ts", $"v").as[(Double, Option[Double])].collect().toSeq
    assert(nocb == Seq((0.5, Some(10.0)), (1.0, Some(10.0)), (2.0, Some(30.0)), (3.5, None)))
  }

  // src/rbindlist.c getMaxType: logical < integer < integer64 < double <
  // character; date < timestamp; list columns promote element-wise.
  test("rbindlist type-promotion ladder") {
    import org.apache.spark.sql.types._
    def vType(dfs: org.apache.spark.sql.DataFrame*) =
      Reshape.rbindlist(dfs.toSeq).schema("v").dataType
    val b = Seq((1, true)).toDF("id", "v")
    val i = Seq((2, 5)).toDF("id", "v")
    val l = Seq((3, 7L)).toDF("id", "v")
    val d = Seq((4, 1.5)).toDF("id", "v")
    val s = Seq((5, "x")).toDF("id", "v")
    assert(vType(b, i) == IntegerType)
    assert(vType(i, l) == LongType)
    assert(vType(b, l, d) == DoubleType)
    assert(vType(i, d, s) == StringType)
    // logical promotes through the whole ladder as 0/1
    val vals = Reshape.rbindlist(Seq(b, i)).orderBy($"id")
      .select($"v").as[Int].collect().toSeq
    assert(vals == Seq(1, 5))
    // date < timestamp
    val dt1 = Seq((1, java.sql.Date.valueOf("2024-01-02"))).toDF("id", "v")
    val ts1 = Seq((2, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))).toDF("id", "v")
    assert(vType(dt1, ts1) == TimestampType)
    // list columns promote element-wise
    val ai = Seq((1, Seq(1, 2))).toDF("id", "v")
    val ad = Seq((2, Seq(1.5))).toDF("id", "v")
    assert(vType(ai, ad) == ArrayType(DoubleType, containsNull = false))
    // non-promotable pair errors with the column name
    val st = Seq((1, (1, 2))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] { vType(st, i) }
    assert(e.getMessage.contains("'v'"))
  }

  // R/fcast.R:115-126 construct_funs: multi-fun dcast columns are named
  // <value.var>_<fun>_<pivotValue>.
  test("dcast multi-fun column naming follows the reference convention") {
    val df = Seq(("a", "F", 1.0, 10.0), ("a", "O", 2.0, 20.0), ("b", "F", 3.0, 30.0))
      .toDF("k", "st", "qty", "price")
    val wide = Reshape.dcastMulti(df, Seq("k"), "st", Seq("F", "O"),
      Seq("qty_sum" -> sum($"qty"), "price_sum" -> sum($"price")))
    assert(wide.columns.toSeq ==
      Seq("k", "qty_sum_F", "price_sum_F", "qty_sum_O", "price_sum_O"))
    val row = wide.filter($"k" === "a").select($"qty_sum_F", $"price_sum_O")
      .as[(Double, Double)].collect().head
    assert(row == ((1.0, 20.0)))
    // single aggregate keeps the bare pivot-value names (both engines)
    val one = Reshape.dcastMulti(df, Seq("k"), "st", Seq("F", "O"),
      Seq("qty_sum" -> sum($"qty")))
    assert(one.columns.toSeq == Seq("k", "F", "O"))
    // referenceNames=false keeps Spark's native <pivot>_<agg> names
    val native = Reshape.dcastMulti(df, Seq("k"), "st", Seq("F", "O"),
      Seq("qty_sum" -> sum($"qty"), "price_sum" -> sum($"price")),
      referenceNames = false)
    assert(native.columns.toSeq ==
      Seq("k", "F_qty_sum", "F_price_sum", "O_qty_sum", "O_price_sum"))
  }

  // ---- loader contract: both events ts encodings (verdict item 6) --------

  // /root/testdata regenerated mid-round-7 with a new events encoding and
  // the then-loader died at analysis, darkening 20 queries. Lock the
  // contract: raw long nanos AND native timestamp_ntz parquet both load
  // as session-TZ timestamps with identical values.
  test("Tables.load events: long-nanos and timestamp_ntz fixtures agree") {
    import org.apache.spark.sql.types.TimestampType
    val tmp = TestTmp.dir("graft_enc").toFile.getAbsolutePath
    val micros = Seq(1700000000123456L, 1700000100987654L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us * 1000L, 10L + i, "click", 1.0 * i) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    base.write.parquet(s"$tmp/long/events.parquet")
    base.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      .write.parquet(s"$tmp/ntz/events.parquet")
    val a = Tables.load(spark, s"$tmp/long", "events")
    val b = Tables.load(spark, s"$tmp/ntz", "events")
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"event_id").select(unix_micros($"ts")).as[Long].collect().toSeq
    assert(vals(a) == micros)
    assert(vals(b) == micros)
  }

  // fwrite sep2 list columns survive a CSV round-trip (R/fwrite.R sep2)
  test("fwrite sep2 list column round-trips through fread + split") {
    import graft.sources.Fread
    val tmp = TestTmp.dir("graft_sep2").toFile.getAbsolutePath
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("d")), (3L, Seq.empty[String]))
      .toDF("id", "tags")
    Fread.fwrite(df, s"$tmp/out", Fread.FwriteOptions(sep2 = "|"))
    // an empty list writes as the empty field — decode "" (or null)
    // back to the empty array, the same ambiguity the reference accepts
    val back = Fread.fread(spark, s"$tmp/out")
      .withColumn("tags",
        when($"tags".isNull || length($"tags") === 0, array().cast("array<string>"))
          .otherwise(split($"tags", "\\|")))
      .orderBy($"id")
    val rows = back.select($"id", $"tags").as[(Long, Seq[String])].collect().toSeq
    assert(rows == Seq((1L, Seq("a", "b", "c")), (2L, Seq("d")), (3L, Seq())))
  }

  // uniqueN(na.rm=FALSE) counts NA as a distinct value (R/duplicated.R:102)
  test("uniqueNAgg counts NA as a value; na.rm=TRUE drops it") {
    import graft.functions.Funcs
    val df = Seq(("a", Some(1)), ("a", Some(1)), ("a", None), ("a", None),
      ("b", Some(2)), ("b", Some(3))).toDF("g", "v")
    val out = df.groupBy($"g").agg(
      Funcs.uniqueNAgg($"v").as("u"),
      Funcs.uniqueNAgg($"v", naRm = true).as("u_rm"))
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    // group a: values {1, NA} -> 2 with NA counted, 1 without
    assert(out == Seq(("a", 2L, 1L), ("b", 2L, 2L)))
  }

  // src/forder.c:53 nalast=0: NA sorts FIRST in BOTH directions by
  // default; na.last=TRUE puts it last in both.
  test("setorderNa: NA first in both directions by default, last with naLast") {
    val df = Seq((1, Some(5.0)), (2, None: Option[Double]), (3, Some(1.0)))
      .toDF("id", "v")
    def ids(d: DT) = d.df.select($"id").as[Int].collect().toSeq
    assert(ids(DT(df).setorderNa(Seq("v" -> true))) == Seq(2, 3, 1))
    assert(ids(DT(df).setorderNa(Seq("v" -> false))) == Seq(2, 1, 3))
    assert(ids(DT(df).setorderNa(Seq("v" -> true), naLast = true)) == Seq(3, 1, 2))
    assert(ids(DT(df).setorderNa(Seq("v" -> false), naLast = true)) == Seq(1, 3, 2))
  }

  // src/chmatch.c: %chin%/%notin% are match-based — never NA. An NA
  // probe matches an NA in the set (TRUE) and misses otherwise (FALSE).
  test("chin/notin never return NA; NA probe matches NA in the set") {
    import graft.functions.Funcs
    val df = Seq((1, Some("a")), (2, None: Option[String]), (3, Some("b")))
      .toDF("id", "s")
    val out = df.select($"id",
      Funcs.chin($"s", Seq("a")).as("c1"),
      Funcs.chin($"s", Seq("a", null)).as("c2"),
      Funcs.notin($"s", Seq("a")).as("n1"))
      .orderBy($"id").as[(Int, Boolean, Boolean, Boolean)].collect().toSeq
    // no null anywhere in the three result columns
    assert(out == Seq((1, true, true, false), (2, false, true, true),
      (3, false, false, true)))
  }

  // src/gsumm.c na.rm=FALSE default: any NA in the group -> aggregate NA
  test("sumNa/meanNa/minNa: NA poisons the group unless naRm") {
    import graft.functions.Funcs
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(2.0)), ("b", Some(3.0)))
      .toDF("g", "v")
    val out = df.groupBy($"g").agg(
      Funcs.sumNa($"v").as("s"), Funcs.meanNa($"v").as("m"),
      Funcs.minNa($"v").as("mn"), Funcs.maxNa($"v").as("mx"),
      Funcs.sumNa($"v", naRm = true).as("s_rm"))
      .orderBy($"g")
      .as[(String, Option[Double], Option[Double], Option[Double],
           Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", None, None, None, None, Some(1.0)),
      ("b", Some(5.0), Some(2.5), Some(2.0), Some(3.0), Some(5.0))))
  }

  // froll algo="fast" (src/froll.c:13-24): prefix-difference rolling
  // sum/mean must agree with the per-frame aggregate on integral data
  // under the same na.rm=FALSE and partial rules.
  test("frollFast == froll for sum and mean, incl. interior nulls and partial") {
    import graft.operators.Windows
    val df = ((1 to 10).map(i => ("a", i, Some(i.toLong))) ++
      Seq(("a", 11, None), ("a", 12, Some(5L))) ++
      (1 to 4).map(i => ("b", i, Some(i * 10L))))
      .toDF("g", "t", "v")
    for (partial <- Seq(false, true)) {
      val slow = df.withColumn("s",
        Windows.froll("sum", $"v", 3, Seq("g"), Seq($"t".asc), partial = partial))
        .withColumn("m",
          Windows.froll("mean", $"v", 3, Seq("g"), Seq($"t".asc), partial = partial))
      val fast = Windows.frollFast(
        Windows.frollFast(df, "s", "sum", $"v", 3, Seq("g"), Seq($"t".asc),
          partial = partial),
        "m", "mean", $"v", 3, Seq("g"), Seq($"t".asc), partial = partial)
      val a = slow.orderBy($"g", $"t")
        .select($"g", $"t", $"s".cast("double"), $"m".cast("double"))
        .as[(String, Int, Option[Double], Option[Double])].collect().toSeq
      val b = fast.orderBy($"g", $"t")
        .select($"g", $"t", $"s".cast("double"), $"m".cast("double"))
        .as[(String, Int, Option[Double], Option[Double])].collect().toSeq
      assert(a == b, s"partial=$partial")
    }
  }

  // Plan locks: the native kernels stay inside whole-stage codegen —
  // a CodegenFallback would demote the Project stage entirely.
  test("DotProduct and NearestCentroid evaluate inside WholeStageCodegen") {
    // parquet-backed input: a tiny LocalRelation would be constant-folded
    // by the optimizer before any stage forms
    val df = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    def codegenStages(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.size
    val dot = df.select(graft.plans.DotProduct($"embedding", $"embedding").as("d"))
    assert(codegenStages(dot) > 0, dot.queryExecution.executedPlan.toString)
    val assign = graft.sim.Similarity.ivfAssign(df, "embedding",
      Seq(Seq.fill(8)(1.0), Seq.fill(8)(-1.0)))
    assert(codegenStages(assign) > 0, assign.queryExecution.executedPlan.toString)
    assert(assign.queryExecution.executedPlan.toString
      .toLowerCase.contains("nearestcentroid"))
  }

  // split.data.table(by=) (R/split.R): map of sub-tables + the
  // partitioned-write cluster form.
  test("splitBy: per-key sub-tables incl. NA key; writeSplit round-trips with pruning") {
    val df = Seq((1, Some("a"), 10), (2, Some("a"), 20), (3, Some("b"), 30),
      (4, None: Option[String], 40)).toDF("id", "g", "v")
    val parts = DT(df).splitBy(Seq("g"))
    assert(parts.keySet == Set(Seq("a"), Seq("b"), Seq("NA")))
    assert(parts(Seq("a")).df.count() == 2)
    assert(parts(Seq("NA")).df.select($"id").as[Int].collect().toSeq == Seq(4))
    intercept[IllegalArgumentException] {
      DT(df).splitBy(Seq("id"), maxGroups = 2)
    }
    val tmp = TestTmp.dir("graft_split").toFile.getAbsolutePath
    DT(df.filter($"g".isNotNull)).writeSplit(s"$tmp/out", Seq("g"))
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 3)
    // partition pruning: the g=b filter reads only that directory
    val pruned = back.filter($"g" === "b")
    assert(pruned.count() == 1)
  }

  // src/bmerge.c: NA and NaN are DISTINCT joinable double key values.
  // Mapping: NA -> null (matches under nullSafe's <=>), NaN -> NaN
  // (Spark's NaN semantics make all NaN equal in joins/grouping) — so
  // a nullSafe join reproduces the reference's double-key behavior.
  test("double join keys: NA matches NA, NaN matches NaN, and they never cross-match") {
    val x = Seq(("na", Option.empty[Double]), ("nan", Some(Double.NaN)),
      ("one", Some(1.0))).toDF("xtag", "k")
    val y = Seq(("NA", Option.empty[Double]), ("NAN", Some(Double.NaN)),
      ("ONE", Some(1.0))).toDF("ytag", "k")
    val out = DT(x).join(DT(y), Seq("k"), "inner", nullSafe = true)
      .df.select($"xtag", $"ytag").as[(String, String)].collect().toSet
    assert(out == Set(("na", "NA"), ("nan", "NAN"), ("one", "ONE")))
  }

  // SQL face of the custom expressions (SURVEY §4.2): every graft
  // kernel is callable from spark.sql after registerAll/register.
  test("SQL functions: graft_dot, graft_simhash, graft_token_set_count, graft_round_mantissa") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  graft_token_set_count(array('the', 'cat', 'AND'), 'the,and') AS c,
        |  graft_round_mantissa(1.0000000000000002d, 1) AS rm,
        |  graft_simhash(array('a', 'b')) AS sh""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
    assert(r.getDouble(2) == 1.0)
    // simhash value is pinned by PortableHashSpec batteries; here just
    // assert it is deterministic across two invocations
    val again = spark.sql("SELECT graft_simhash(array('a', 'b'))").head().getLong(0)
    assert(r.getLong(3) == again)
  }

  // src/shift.c: fill pads only the VACATED positions; NAs already in
  // the data pass through (coalesce-style filling would overwrite them).
  test("shift fill pads only out-of-range slots, interior NA passes through") {
    import graft.operators.Windows
    val df = Seq((1, Some(10.0)), (2, None: Option[Double]), (3, Some(30.0)))
      .toDF("id", "v")
    val out = df.select($"id",
      Windows.shift($"v", 1, Nil, Seq($"id".asc), fill = lit(0.0),
        allowGlobal = true).as("lag1"),
      Windows.shift($"v", -1, Nil, Seq($"id".asc), fill = lit(-1.0),
        allowGlobal = true).as("lead1"))
      .orderBy($"id")
      .as[(Int, Option[Double], Option[Double])].collect().toSeq
    // row 3's lag is row 2's genuine NA -> stays NA; row 1 vacated -> 0
    assert(out == Seq(
      (1, Some(0.0), None), (2, Some(10.0), Some(30.0)), (3, None, Some(-1.0))))
  }

  // tstrsplit(type.convert=TRUE): a split column whose every non-null
  // part parses numerically becomes numeric (R/transpose.R:26).
  test("tstrsplit type.convert: lossless-int, double, and mixed columns") {
    import org.apache.spark.sql.types._
    val df = Seq((1, "7:1.5:x"), (2, "8:2:y"), (3, "9::z")).toDF("id", "s")
    val out = Reshape.tstrsplit(df, "s", ":", 3, typeConvert = true)
    assert(out.schema("V1").dataType == LongType)
    assert(out.schema("V2").dataType == DoubleType)   // "2" + "1.5" -> double
    assert(out.schema("V3").dataType == StringType)   // x/y/z stay string
    val r = out.orderBy($"id").select($"V1", $"V2", $"V3")
      .as[(Long, Option[Double], String)].collect().toSeq
    assert(r == Seq((7L, Some(1.5), "x"), (8L, Some(2.0), "y"), (9L, None, "z")))
  }

  // %plike% (R/like.R:24 perl=TRUE): Java regex is PCRE-flavored, so
  // lookaround works where %like%'s RE2-portable subset would not.
  test("plike supports perl-style lookaround") {
    import graft.functions.Funcs
    val df = Seq((1, "foobar"), (2, "foo"), (3, "bar")).toDF("id", "s")
    val out = df.filter(Funcs.plike($"s", "foo(?=bar)"))
      .select($"id").as[Int].collect().toSeq
    assert(out == Seq(1))
    val neg = df.filter(Funcs.plike($"s", "^(?!foo).*"))
      .select($"id").as[Int].collect().toSeq
    assert(neg == Seq(3))
  }

  // DotProduct/TokenSetCount ship real doGenCode now (a CodegenFallback
  // expression demotes its whole stage out of whole-stage codegen) —
  // pin generated-path values against hand-computed ones.
  test("DotProduct and TokenSetCount codegen path matches interpreted values") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), Seq("The", "cat", "and", "dog")),
      (2L, Seq(0.0, 0.0), Seq(1.0, 1.0), Seq[String]()),
      (3L, Seq(2.0), Seq(3.0, 9.0), Seq("AND", "the", "the")))
      .toDF("id", "a", "b", "toks")
    val out = df.select($"id",
      graft.plans.DotProduct($"a", $"b").as("dot"),
      graft.plans.TokenSetCount($"toks", Seq("the", "and")).as("c"))
      .orderBy($"id").as[(Long, Double, Int)].collect().toSeq
    // row 3: length-mismatched arrays dot over the shorter prefix
    assert(out == Seq((1L, 32.0, 2), (2L, 0.0, 0), (3L, 6.0, 3)))
    // null input arrays -> null results through the null-safe codegen
    val withNull = Seq((1L, Option(Seq(1.0)), Option(Seq(2.0))),
      (2L, None: Option[Seq[Double]], Option(Seq(2.0))))
      .toDF("id", "a", "b")
      .select($"id", graft.plans.DotProduct($"a", $"b").as("dot"))
      .orderBy($"id").as[(Long, Option[Double])].collect().toSeq
    assert(withNull == Seq((1L, Some(2.0)), (2L, None)))
  }

  // setkey's cluster-persistent form: both sides bucketed+sorted by the
  // key -> the keyed join and the keyed groupBy plan with ZERO shuffle
  // (the SURVEY §4.1 "key reuse" claim, locked on the physical plan).
  test("setKeyBucketed: co-bucketed join and keyed groupBy run without Exchange") {
    import graft.operators.Scale
    val a = (1 to 2000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 97, s"n$i")).toDF("k", "nb")
    val ta = Scale.setKeyBucketed(a, "r8_bkt_a", Seq("k"), buckets = 8)
    val tb = Scale.setKeyBucketed(b, "r8_bkt_b", Seq("k"), buckets = 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join and a literal plan (no AQE re-write)
      // so the lock reads the static physical plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        val plan = df.queryExecution.executedPlan
        plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
      }
      val joined = ta.join(tb, Seq("k"))
      assert(exchanges(joined) == 0,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
      val agg = ta.groupBy($"k").agg(sum($"va").as("s"))
      assert(exchanges(agg) == 0,
        s"keyed groupBy on a bucketed table must not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 97)
      // control: the same join UNBUCKETED does shuffle (the lock means something)
      assert(exchanges(a.join(b, Seq("k"))) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS r8_bkt_a")
      spark.sql("DROP TABLE IF EXISTS r8_bkt_b")
    }
  }
}
