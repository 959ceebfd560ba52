package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GlobalOrdered, Windows}
import graft.sources.Fread

/** Round-15 hardening: the carried ADVICE lows — global-frank argument
  * validation, the frankv secondary na.last contract, the phantom
  * guard on integer axes, and sniffBom's best-effort/deterministic
  * contract.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- frank(by=Nil) argument validation ------------------------------

  test("frank(by=Nil, order=Nil) raises an informative route error, not NoSuchElement") {
    val df = Seq(1, 2, 3).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Windows.frank(df, Nil, Nil, "min", Nil, "r")
    }
    assert(e.getMessage.contains("order"), s"unhelpful message: ${e.getMessage}")
  }

  // ---- frankv secondary na.last contract -------------------------------

  test("global frankv: secondary null placement follows the primary's na.last") {
    // reference frankv takes ONE na.last for all ranked columns
    // (R/frank.R) — a nulls modifier on a secondary order column is
    // overridden by the primary's placement
    val df = Seq(
      (1, Option(1), "r1"), (1, None: Option[Int], "r2"),
      (1, Option(2), "r3"), (2, Option(1), "r4")).toDF("a", "b", "tag")

    // primary asc_nulls_last => na.last=true: b's nulls rank LAST within
    // the a=1 tie block even though the caller wrote asc_nulls_first
    val last = Windows.frank(df,
      Seq($"a".asc_nulls_last, $"b".asc_nulls_first), Seq($"a", $"b"),
      "min", Nil, "r")
      .select($"tag", $"r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("r1" -> 1L, "r3" -> 2L, "r2" -> 3L, "r4" -> 4L))

    // primary asc_nulls_first => na.last=false: b's nulls rank FIRST
    val first = Windows.frank(df,
      Seq($"a".asc_nulls_first, $"b".asc_nulls_last), Seq($"a", $"b"),
      "min", Nil, "r")
      .select($"tag", $"r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == Map("r2" -> 1L, "r1" -> 2L, "r3" -> 3L, "r4" -> 4L))
  }

  // ---- phantom guard on integer axes -----------------------------------

  test("phantomRatioEst: integer bounds estimate like their double values") {
    val longs: Array[Any] = (1 until 32).map(i => (i * 31L): Any).toArray
    val doubles: Array[Any] = (1 until 32).map(i => (i * 31.0): Any).toArray
    assert(GlobalOrdered.phantomRatioEst(longs, 1000.0) ==
      GlobalOrdered.phantomRatioEst(doubles, 1000.0))
    assert(GlobalOrdered.phantomRatioEst(longs, 1000.0) > 10.0)
    // ints too, and the documented stand-down on non-numeric bounds
    val ints: Array[Any] = (1 until 32).map(i => (i * 31): Any).toArray
    assert(GlobalOrdered.phantomRatioEst(ints, 1000.0) > 10.0)
    val strs: Array[Any] = Array[Any]("a", "b")
    assert(GlobalOrdered.phantomRatioEst(strs, 1000.0) == 0.0)
  }

  test("frolladapt guard fires on a LONG time axis (was inert pre-widening)") {
    GlobalOrdered.clearFits()
    val df = spark.range(0, 2000).select(
      col("id").as("k"), (col("id") * 7L % 1997L).as("t")) // LongType axis
      .repartition(8)
    val before = GlobalOrdered.phantomGuardReductions.get()
    val guarded = GlobalOrdered.frolladapt(df, col("t"), 1500L, "an",
      buckets = 32)
    val naive = Windows.frolladaptDF(
      df, "an", col("t"), 1500L, Nil, allowGlobal = true)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), col("an")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(guarded) == m(naive))
    assert(GlobalOrdered.phantomGuardReductions.get() > before)
  }

  // ---- fread issue_2157 sampling fixtures (tests.Rraw 1768/1769) --------

  private val fx = "/root/reference/inst/tests"

  test("gz sampling overlap: late fractional values make X8 double (issue_2157, test 1768)") {
    val df = Fread.fread(spark, s"$fx/issue_2157_sampling_overlap.txt.gz")
    assert(df.columns.toSeq == (1 to 8).map("X" + _))
    assert(df.count() == 1314)
    // the first fractional X8 appears past row 200 — a sampled type
    // guess of integer must still end up double over the whole file
    assert(df.schema("X8").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.filter(col("X2").isNotNull).count() == 0) // all-empty column
    val r0 = df.head()
    assert(r0.getAs[String]("X1") == "ABCD021917")
    assert(r0.getAs[Double]("X8") == 678.0)
    assert(df.filter(abs(col("X8") - 732.981767087638) < 1e-6).count() >= 1)
  }

  test("bz2 sampling reached EOF early: whole-file types survive (issue_2157, test 1769)") {
    val df = Fread.fread(spark, s"$fx/issue_2157_sampling_reached_eof_early.txt.bz2")
    assert(df.count() == 1228 && df.columns.length == 11)
    assert(df.schema("X10").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.head().isNullAt(0)) // first X1 is empty -> NA
    assert(df.filter(col("X1").cast("string") === "2017-05-10" &&
      col("X10") === -112186.0 && col("X11") === 500).count() == 1)
  }

  // ---- frollapply fill= (R/frollapply.R simplifylist) -------------------

  test("frollApplyF fill= pads only incomplete windows; coerces to answer type") {
    val df = Seq((1, Option(1.0)), (2, Option(2.0)),
      (3, None: Option[Double]), (4, Option(4.0))).toDF("i", "x")
    val f = (rows: Seq[org.apache.spark.sql.Row]) =>
      if (rows.exists(_.isNullAt(0))) null
      else rows.map(_.getDouble(0)).sum
    def run(allowGlobal: Boolean) =
      Windows.frollApplyF(df, "s", Seq("x" -> $"x"), 2, Nil, Seq($"i".asc),
        f, org.apache.spark.sql.types.DoubleType,
        allowGlobal = allowGlobal, fill = lit(99))
        .select($"i", $"s").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
        .toMap
    // position 1 is INCOMPLETE -> fill (coerced 99 -> 99.0); positions
    // whose complete window made FUN return null stay null, NOT fill
    val expect = Map(1 -> 99.0, 2 -> 3.0, 3 -> null, 4 -> null)
    assert(run(allowGlobal = true) == expect)
    assert(run(allowGlobal = false) == expect) // global tier agrees

    // integer answers truncate a double fill (reference 6001.296/.297)
    val ints = Windows.frollApplyF(df, "s", Seq("x" -> $"x"), 2, Nil,
      Seq($"i".asc),
      (rows: Seq[org.apache.spark.sql.Row]) =>
        if (rows.exists(_.isNullAt(0))) null
        else rows.map(_.getDouble(0)).sum.toInt,
      org.apache.spark.sql.types.IntegerType,
      allowGlobal = true, fill = lit(99.9))
      .filter($"i" === 1).select($"s").head().getInt(0)
    assert(ints == 99)
  }

  test("frollApplyF n=0: FUN over the empty window at every position (tests.Rraw 6001.x82)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
      .withColumn("i", monotonically_increasing_id())
    def run(f: Seq[org.apache.spark.sql.Row] => Any) =
      Windows.frollApplyF(df, "r", Seq("x" -> $"x"), 0, Nil, Seq($"i".asc),
        f, org.apache.spark.sql.types.DoubleType, fill = lit(99))
        .select($"r").collect().map(_.getDouble(0)).toSeq
    // mean over the empty window is NaN everywhere — fill NEVER applies
    // (n=0 windows are complete-empty, not incomplete)
    assert(run(rows => { val vs = rows.map(_.getDouble(0)); vs.sum / vs.size })
      .forall(_.isNaN))
    // sum over the empty window is 0 everywhere
    assert(run(rows => rows.map(_.getDouble(0)).sum) == Seq(0.0, 0.0, 0.0))
  }

  test("froll n=0: constant empty-reduction value per fn (froll.Rraw 6001.x11)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
      .withColumn("i", monotonically_increasing_id())
    def run(fn: String): Seq[Any] =
      Windows.frollDF(df, "r", fn, $"x", 0, Nil, Seq($"i".asc))
        .select($"r").collect()
        .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(run("sum") == Seq(0.0, 0.0, 0.0))
    assert(run("prod") == Seq(1.0, 1.0, 1.0))
    assert(run("max").forall(_ == Double.NegativeInfinity))
    assert(run("min").forall(_ == Double.PositiveInfinity))
    assert(run("mean").forall(v => v.asInstanceOf[Double].isNaN))
    assert(run("median").forall(_ == null)) // NA_real_, not NaN
    assert(run("sd").forall(_ == null))
    assert(run("var").forall(_ == null))
  }

  // ---- rollup/cube id= spellings (R/groupingsets.R:1-39) ----------------

  test("rollupAgg/cubeAgg generate the reference set lists with id= bitmask") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("r", "s", "v")
    val roll = DT(df).rollupAgg(
      Seq("r" -> $"r", "s" -> $"s"), Seq(sum($"v").as("sv")), id = true).df
    val rollG = roll.groupBy($"grouping").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // prefix sets (r,s), (r), (): gid 0 per (r,s) combo, 1 per r, 3 total
    assert(rollG == Map(0 -> 3L, 1 -> 2L, 3 -> 1L))
    assert(roll.filter($"grouping" === 3).select($"sv").head().getLong(0) == 6L)

    val cube = DT(df).cubeAgg(
      Seq("r" -> $"r", "s" -> $"s"), Seq(sum($"v").as("sv")), id = true).df
    val cubeG = cube.groupBy($"grouping").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // power set adds gid=2 (s alone): one row per distinct s
    assert(cubeG == Map(0 -> 3L, 1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("frollApplyEach: by.column x vector-n with give.names naming (R/frollapply.R)") {
    val df = Seq((1, 1.0, 10.0), (2, 2.0, 20.0), (3, 3.0, 30.0))
      .toDF("i", "a", "b")
    val sumF = (rows: Seq[org.apache.spark.sql.Row]) =>
      rows.map(_.getDouble(0)).sum
    val out = Windows.frollApplyEach(df,
      Seq("a" -> $"a", "b" -> $"b"), Seq(2, 3), Seq.empty, Seq($"i".asc),
      sumF, org.apache.spark.sql.types.DoubleType, allowGlobal = true)
    assert(out.columns.toSeq.takeRight(4) ==
      Seq("a_rollapply_2", "a_rollapply_3", "b_rollapply_2", "b_rollapply_3"))
    val last = out.orderBy($"i".desc).head()
    assert(last.getDouble(out.columns.indexOf("a_rollapply_2")) == 5.0)
    assert(last.getDouble(out.columns.indexOf("a_rollapply_3")) == 6.0)
    assert(last.getDouble(out.columns.indexOf("b_rollapply_3")) == 60.0)
    // incomplete leading windows stay null (fill default)
    assert(out.orderBy($"i".asc).head()
      .isNullAt(out.columns.indexOf("b_rollapply_2")))
  }

  // ---- nafill.Rraw edges (1.03-1.04, 1.21-1.22, 1.44-1.45) ---------------

  test("nafill locf/nocb: NaN fills like NA, ±Inf carries like a value (nafill.Rraw 1.21/1.22)") {
    // z = (NA, Inf, 3, 4, NaN, NA, 7, 8, -Inf, NA) — positions 1-10
    val z = Seq[(Int, Option[Double])](
      (1, None), (2, Some(Double.PositiveInfinity)), (3, Some(3.0)),
      (4, Some(4.0)), (5, Some(Double.NaN)), (6, None), (7, Some(7.0)),
      (8, Some(8.0)), (9, Some(Double.NegativeInfinity)), (10, None))
      .toDF("i", "z")
    def run(typ: String) =
      Windows.nafillDF(z, "r", typ, $"z", Nil, Seq($"i".asc))
        .orderBy($"i").select($"r").collect()
        .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(run("locf") == Seq(null, Double.PositiveInfinity, 3.0, 4.0, 4.0,
      4.0, 7.0, 8.0, Double.NegativeInfinity, Double.NegativeInfinity))
    assert(run("nocb") == Seq(Double.PositiveInfinity, Double.PositiveInfinity,
      3.0, 4.0, 7.0, 7.0, 7.0, 8.0, Double.NegativeInfinity, null))
  }

  test("nafill on dates retains the type (nafill.Rraw 1.44/1.45 #3617)") {
    val d = Seq((1, Some("2020-01-01")), (2, Some("2020-01-02")),
      (3, None: Option[String]), (4, Some("2020-01-04")), (5, None: Option[String]))
      .toDF("i", "s").withColumn("d", $"s".cast("date")).drop("s")
    val locf = Windows.nafillDF(d, "r", "locf", $"d", Nil, Seq($"i".asc))
    assert(locf.schema("r").dataType == org.apache.spark.sql.types.DateType)
    val got = locf.orderBy($"i").select($"r".cast("string")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("2020-01-01", "2020-01-02", "2020-01-02",
      "2020-01-04", "2020-01-04"))
  }

  test("setnafill const: fill coerces to the column type (nafill.Rraw 1.03/1.04)") {
    val df = Seq((1, Option(1)), (2, None: Option[Int]), (3, Option(3)))
      .toDF("i", "x")
    val filled = DT(df).setnafill(Seq("x"), "const", Seq(lit(5.0))).df
    assert(filled.schema("x").dataType ==
      org.apache.spark.sql.types.IntegerType) // data never promotes
    assert(filled.orderBy($"i").select($"x").as[Int].collect().toSeq ==
      Seq(1, 5, 3))
  }

  // ---- .Last.updated analog (NAMESPACE:75) -------------------------------

  test("updateCounted/updateJoinCounted return the touched-row count") {
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v")
    val (u1, n1) = DT(df).updateCounted($"v" > 15, "v", $"v" + 1)
    assert(n1 == 2L)
    assert(u1.df.orderBy($"k").select($"v").as[Int].collect().toSeq ==
      Seq(10, 21, 31))
    val probe = DT(Seq((2, 99), (2, 98), (5, 97)).toDF("k", "w")
      .groupBy($"k").agg(max($"w").as("w")))
    val (u2, n2) = DT(df).updateJoinCounted(probe, Seq("k"), "v" -> col("w"))
    assert(n2 == 1L) // only k=2 exists in the target
    assert(u2.df.orderBy($"k").select($"v").as[Int].collect().toSeq ==
      Seq(10, 99, 30))
  }

  // ---- plan-time guard fast paths (SURVEY §4.2 item 4) -------------------

  test("plannedJoinBound: known row counts give a product bound; guard semantics unchanged") {
    import graft.operators.Joins
    val x = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val i = Seq((1, 10), (1, 11)).toDF("k", "w")
    // local relations carry exact row counts -> plan-time bound 3x2
    assert(Joins.plannedJoinBound(x, i).contains(BigInt(6)))
    // fast accept: product within limit, no throw
    Joins.cartesianGuard(x, i, Seq("k"), maxRows = 6)
    // runtime path still rejects a genuine explosion (true est = 4 > 3,
    // and the plan bound 6 > 3 cannot fast-accept)
    intercept[IllegalArgumentException] {
      Joins.cartesianGuard(x, i, Seq("k"), maxRows = 3)
    }
    // parquet scans have no rowCount stat -> None (runtime path only)
    val scan = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    assert(Joins.plannedJoinBound(scan, scan).isEmpty)
  }

  test("provablyUniqueOn: aggregate/distinct keyed plans skip the mult=error probe") {
    import graft.operators.Joins
    val raw = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    // grouped by k: unique on (k) and on any superset
    val byK = raw.groupBy($"k").agg(count(lit(1)).as("n"))
    assert(Joins.provablyUniqueOn(byK, Seq("k")))
    assert(Joins.provablyUniqueOn(byK, Seq("k", "n")))
    // raw duplicates: not provable, and the runtime probe fires
    assert(!Joins.provablyUniqueOn(raw, Seq("k")))
    intercept[IllegalArgumentException] { Joins.assertNoDup(raw, Seq("k")) }
    // grouping by a superset of `on` proves nothing about `on` alone
    val byKV = raw.groupBy($"k", $"v").agg(count(lit(1)).as("n"))
    assert(!Joins.provablyUniqueOn(byKV, Seq("k")))
    // provably unique passes without error
    Joins.assertNoDup(byK, Seq("k"))
  }

  // ---- per-rep steal attribution (Bench defense (e)) --------------------

  test("stealPoisoned: >5% of jiffy capacity with >=2 jiffies absolute") {
    // 200 jiffies over a 0.4s rep on 32 cpus = 15.6% of capacity
    assert(Bench.stealPoisoned(0.4, 200, 32))
    // 1 jiffy is sub-tick jitter regardless of fraction
    assert(!Bench.stealPoisoned(0.001, 1, 32))
    // 2 jiffies over 0.1s x 32 cpus = 0.6% — benign background steal
    assert(!Bench.stealPoisoned(0.1, 2, 32))
    // 3 jiffies over a 10ms rep = 9.4% — poisoned
    assert(Bench.stealPoisoned(0.01, 3, 32))
  }

  test("splitStolen: planted steal excludes the poisoned rep; all-stolen keeps all") {
    val mixed = Seq((0.10, 0L), (0.42, 200L), (0.11, 1L))
    val s = Bench.splitStolen(mixed, 32)
    assert(s.kept == Seq(0.10, 0.11) && s.stolen == 1 && !s.allStolen)
    assert(s.stealJiffies == 201L)

    val allBad = Seq((0.42, 200L), (0.38, 150L))
    val a = Bench.splitStolen(allBad, 32)
    assert(a.allStolen && a.stolen == 2 && a.kept == Seq(0.42, 0.38))

    // failed-only input: nothing stolen, nothing kept, not "allStolen"
    val none = Bench.splitStolen(Nil, 32)
    assert(!none.allStolen && none.kept.isEmpty && none.stealJiffies == 0L)
  }

  // ---- deterministic shuffle-byte accounting ----------------------------

  test("ShuffleMeter counts shuffle write bytes; zero for shuffle-free jobs") {
    val meter = new Bench.ShuffleMeter(spark.sparkContext)
    val nation = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    val s0 = meter.snapshot()
    nation.select($"n_name").count() // count aggregates partial->final: tiny but nonzero shuffle
    val s1 = meter.snapshot()
    // a repartition moves every row through the shuffle: strictly more bytes
    nation.repartition(4, $"n_regionkey").agg(count(lit(1))).collect()
    val s2 = meter.snapshot()
    assert(s2 - s1 > 0, "repartition wrote no shuffle bytes?")
    assert(s2 - s1 >= s1 - s0)
  }

  test("shufDrifted: ratio past 1.3x AND >8KB apart, both sides measured") {
    assert(Bench.shufDrifted(3000000L, 1000000L))
    assert(Bench.shufDrifted(1000000L, 3000000L))
    assert(Bench.shufDrifted(300000L, 100000L))     // round-17: sub-MB drift flags now
    assert(!Bench.shufDrifted(1200000L, 1000000L))  // within ratio
    assert(!Bench.shufDrifted(9000L, 2000L))        // < 8KB apart (AQE metadata wobble)
    assert(!Bench.shufDrifted(0L, 5000000L))        // unmeasured side
  }

  test("parsePrevShuffle reads shuf_w per query; tolerant of absence") {
    val txt = """{"sf":"/x","queries":{"a":{"cold":1.0,"warm":0.5,"shuf_w":123},
                 |"b":{"cold":1.0,"warm":0.5}}}""".stripMargin.replace("\n", "")
    assert(Bench.parsePrevShuffle(txt) == Map("a" -> 123L))
    assert(Bench.parsePrevShuffle("junk").isEmpty)
  }

  // ---- sniffBom: best-effort + deterministic target --------------------

  test("sniffBom returns None on unreadable paths instead of throwing") {
    assert(Fread.sniffBom(spark, "/nonexistent/nowhere.csv").isEmpty)
    assert(Fread.sniffBom(spark, "/root/repo/target/{bad-glob").isEmpty)
  }

  test("sniffBom picks the name-sorted first file of a directory") {
    val dir = TestTmp.dir("sniffbom").toFile
    try {
      // write z first so creation order disagrees with name order
      java.nio.file.Files.write(new java.io.File(dir, "z.csv").toPath,
        "x,y\n1,2\n".getBytes("UTF-8"))
      val bom = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        "x,y\n1,2\n".getBytes("UTF-16LE")
      java.nio.file.Files.write(new java.io.File(dir, "a.csv").toPath, bom)
      assert(Fread.sniffBom(spark, dir.getAbsolutePath).contains("UTF-16LE"))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete(): Unit
    }
  }
}
