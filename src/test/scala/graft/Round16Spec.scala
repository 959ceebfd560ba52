package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening: the ShuffleMeter retry fix (max-per-stageId
  * accounting so a load-induced stage retry can't inflate `shuf_w`),
  * plus this round's ADVICE closures.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ---- fwrite qmethod= + quote=TRUE (tests.Rraw 1658.02-.17) -----------

  test("auto quoting doubles embedded quotes by default (1658.04)") {
    val dir = TestTmp.path("graft_fwrite_q1")
    val df = Seq((1, "\"foo"), (2, "ba\"r"), (3, "baz\""), (4, "a \"quoted\" region"))
      .toDF("a", "b")
    graft.sources.Fread.fwrite(df, dir, graft.sources.Fread.FwriteOptions())
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(Seq("1,\"\"\"foo\"", "2,\"ba\"\"r\"", "3,\"baz\"\"\"",
      "4,\"a \"\"quoted\"\" region\"").forall(lines.contains), lines.mkString("|"))
  }

  test("qmethod=escape backslash-escapes embedded quotes (1658.05)") {
    val dir = TestTmp.path("graft_fwrite_q2")
    val df = Seq((1, "\"foo"), (4, "a \"quoted\" region")).toDF("a", "b")
    graft.sources.Fread.fwrite(df, dir,
      graft.sources.Fread.FwriteOptions(qmethod = "escape"))
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.contains("1,\"\\\"foo\""), lines.mkString("|"))
    assert(lines.contains("4,\"a \\\"quoted\\\" region\""), lines.mkString("|"))
  }

  test("quote=TRUE quotes string fields + header, leaves numerics bare (1658.16/.17)") {
    val dir = TestTmp.path("graft_fwrite_q3")
    // one part = one header line, like the reference's single file
    val df = Seq((1, 1), (2, 2), (3, 3)).toDF("a", "b").coalesce(1)
    graft.sources.Fread.fwrite(df, dir,
      graft.sources.Fread.FwriteOptions(quoteMode = "all"))
    val lines = spark.read.textFile(dir).collect().toSeq.sorted
    assert(lines == Seq("\"a\",\"b\"", "1,1", "2,2", "3,3"), lines.mkString("|"))

    val strs = Seq(("foo", "bar")).toDF("a", "b")
    graft.sources.Fread.fwrite(strs, dir,
      graft.sources.Fread.FwriteOptions(quoteMode = "all"))
    val l2 = spark.read.textFile(dir).collect().toSeq.sorted
    assert(l2 == Seq("\"a\",\"b\"", "\"foo\",\"bar\""), l2.mkString("|"))
  }

  test("quote=TRUE + qmethod=double/escape in-field content (1658.03/.06/.08); NA stays bare") {
    val dir = TestTmp.path("graft_fwrite_q4")
    val df = Seq(("foo", Option("ba\"r")), ("x", None: Option[String]))
      .toDF("a", "b")
    graft.sources.Fread.fwrite(df, dir, graft.sources.Fread.FwriteOptions(
      sep = ";", quoteMode = "all"))
    val l1 = spark.read.textFile(dir).collect().toSeq
    assert(l1.contains("\"foo\";\"ba\"\"r\""), l1.mkString("|"))
    assert(l1.contains("\"x\";"), l1.mkString("|")) // null -> bare na
    graft.sources.Fread.fwrite(df, dir, graft.sources.Fread.FwriteOptions(
      sep = ";", quoteMode = "all", qmethod = "escape"))
    val l2 = spark.read.textFile(dir).collect().toSeq
    assert(l2.contains("\"foo\";\"ba\\\"r\""), l2.mkString("|"))
  }

  // ---- fread check.names= (R/fread.R:374, tests.Rraw 134.5) -------------

  test("makeNames: the 134.5 fixture — X-prefix, dot-substitution, .1 cascade") {
    import graft.sources.Fread
    assert(Fread.makeNames(Seq("a.1", "b_1", "1b", "a 1")) ==
      Seq("a.1", "b_1", "X1b", "a.1.1"))
    assert(Fread.makeNames(Seq("", "if", "x", "x", "x")) ==
      Seq("X", "if.", "x", "x.1", "x.2"))
    assert(Fread.makeNames(Seq(".2way", "_u", "ok.name")) ==
      Seq("X.2way", "X_u", "ok.name"))
  }

  test("fread(checkNames=true) uniquifies duplicate header names") {
    val dir = TestTmp.path("graft_fread_checknames")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      "a,a,1b\n1,2,3\n".getBytes("UTF-8"))
    val df = graft.sources.Fread.fread(spark, s"$dir/a.csv",
      graft.sources.Fread.FreadOptions(checkNames = true))
    assert(df.columns.toSeq == Seq("a", "a.1", "X1b"), df.columns.toSeq)
    assert(df.select($"`a.1`").as[Long].head() == 2L)
  }

  // ---- fread fill=N declared width (man/fread.Rd integer fill) ----------

  test("fill=N declares the width: no scan, wide rows parse, narrow rows pad") {
    val dir = TestTmp.path("graft_fread_fillN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // header is 2 wide; a LATER row is 4 wide (past what the header
    // promises — the shape the declared width exists for)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      "a,b\n1,2\n3,4,5,6\n".getBytes("UTF-8"))
    val df = graft.sources.Fread.fread(spark, s"$dir/a.csv",
      graft.sources.Fread.FreadOptions(fillTo = 4))
    assert(df.columns.toSeq == Seq("a", "b", "V3", "V4"), df.columns.toSeq)
    assert(df.count() == 2)
    val wide = df.filter($"a" === 3).head()
    assert(wide.getAs[Long]("V3") == 5L && wide.getAs[Long]("V4") == 6L)
    assert(df.filter($"a" === 1).head().isNullAt(2))
    // the re-bump re-types the padded string columns from the full data
    assert(df.schema("V3").dataType.typeName == "long", df.schema)
  }

  // ---- fwrite eol= (tests.Rraw 1658.10/.62) -----------------------------

  private def rawPart(dir: String): String = {
    val d = new java.io.File(dir)
    val part = d.listFiles().filter(_.getName.startsWith("part-")).head
    new String(java.nio.file.Files.readAllBytes(part.toPath), "UTF-8")
  }

  test("eol=\\r\\n terminates records; embedded newlines in quoted cells survive") {
    val dir = TestTmp.path("graft_fwrite_eol")
    val df = Seq((1, "plain"), (2, "two\nlines")).toDF("a", "b")
      .coalesce(1).sortWithinPartitions($"a")
    graft.sources.Fread.fwrite(df, dir,
      graft.sources.Fread.FwriteOptions(eol = "\r\n"))
    val raw = rawPart(dir)
    assert(raw == "a,b\r\n1,plain\r\n2,\"two\nlines\"\r\n", raw.replace("\r", "<CR>"))
  }

  test("eol with quote=TRUE (1658.10) and with qmethod=escape quoted backslashes") {
    val dir = TestTmp.path("graft_fwrite_eol2")
    val df = Seq(("foo", "bar")).toDF("a", "b").coalesce(1)
    graft.sources.Fread.fwrite(df, dir, graft.sources.Fread.FwriteOptions(
      eol = "\r\n", quoteMode = "all"))
    assert(rawPart(dir) == "\"a\",\"b\"\r\n\"foo\",\"bar\"\r\n")
    // escape convention: \" and \\ pairs inside quotes are data; the
    // record terminator still rewrites
    val tricky = Seq(("q\"uote\nx", 1)).toDF("a", "b").coalesce(1)
    graft.sources.Fread.fwrite(tricky, dir, graft.sources.Fread.FwriteOptions(
      eol = "\r\n", qmethod = "escape"))
    assert(rawPart(dir) == "a,b\r\n\"q\\\"uote\nx\",1\r\n",
      rawPart(dir).replace("\r", "<CR>"))
  }

  test("eol='' is an error like the reference (1658.62)") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.Fread.fwrite(Seq(1).toDF("a"), TestTmp.path("graft_fwrite_eol3"),
        graft.sources.Fread.FwriteOptions(eol = ""))
    }
    assert(e.getMessage.contains("eol must be 1 or more bytes"))
  }

  // ---- fread col.names= + graft_dtoa SQL surface ------------------------

  test("fread col.names= overrides names positionally, after select/drop") {
    val dir = TestTmp.path("graft_fread_colnames")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      "a,b,c\n1,2,3\n".getBytes("UTF-8"))
    val df = graft.sources.Fread.fread(spark, s"$dir/a.csv",
      graft.sources.Fread.FreadOptions(drop = Seq("b"), colNames = Seq("x", "y")))
    assert(df.columns.toSeq == Seq("x", "y"))
    assert(df.as[(Int, Int)].head() == ((1, 3)))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Fread.fread(spark, s"$dir/a.csv",
        graft.sources.Fread.FreadOptions(colNames = Seq("only_one")))
    }
    assert(e.getMessage.contains("col.names"))
  }

  test("graft_dtoa SQL function renders the fwrite float form") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dtoa(0.0001d) AS a, graft_dtoa(0.0001d, 2) AS b, " +
        "graft_dtoa(1000000) AS c, graft_dtoa(CAST('NaN' AS DOUBLE)) AS n")
      .head()
    assert(r.getString(0) == "1e-04")
    assert(r.getString(1) == "0.0001")
    assert(r.getString(2) == "1e+06")
    assert(r.isNullAt(3))
  }

  // ---- froll n=0 typing + negative-n validation (ADVICE r15 lows) ------

  test("froll n=0 sum is typed like the n>=1 sum: long over integral columns") {
    import graft.operators.Windows
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val ints = Seq(1, 2, 3).toDF("x").withColumn("i", monotonically_increasing_id())
    val z = Windows.frollDF(ints, "r", "sum", $"x", 0, Nil, Seq($"i".asc))
    assert(z.schema("r").dataType == LongType, z.schema("r").dataType)
    assert(z.select($"r").as[Long].collect().toSeq == Seq(0L, 0L, 0L))
    val one = Windows.frollDF(ints, "r", "sum", $"x", 1, Nil, Seq($"i".asc))
    assert(one.schema("r").dataType == LongType) // n=0 now matches n>=1
    // double input stays double at both widths; naRm casts to double at
    // every n, so its zero stays double too
    val dbls = Seq(1.0).toDF("x").withColumn("i", monotonically_increasing_id())
    assert(Windows.frollDF(dbls, "r", "sum", $"x", 0, Nil, Seq($"i".asc))
      .schema("r").dataType == DoubleType)
    assert(Windows.frollDF(ints, "r", "sum", $"x", 0, Nil, Seq($"i".asc),
      naRm = true).schema("r").dataType == DoubleType)
  }

  test("froll family rejects negative n instead of planning an invalid frame") {
    import graft.operators.Windows
    val df = Seq(1.0).toDF("x").withColumn("i", monotonically_increasing_id())
    intercept[IllegalArgumentException] {
      Windows.froll("sum", $"x", -1, Seq("x"), Seq($"i".asc))
    }
    intercept[IllegalArgumentException] {
      Windows.frollWindowArray($"x", 0, Seq("x"), Seq($"i".asc))
    }
    intercept[IllegalArgumentException] {
      Windows.frollWindowStructs(Seq("x" -> $"x"), -2, Seq("x"), Seq($"i".asc))
    }
  }

  // ---- topKAgainst deterministic duplicate-probe collapse --------------

  test("topKAgainst collapses duplicate query_ids deterministically (max vector)") {
    import graft.sim.Similarity
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    // contract-violating probe input: same id, two different vectors
    val dup = Seq((9L, Seq(1.0, 0.0)), (9L, Seq(0.0, 1.0)))
      .toDF("query_id", "qv")
    val picks = (1 to 5).map { _ =>
      Similarity.topKAgainst(corpus, "vec_id", "embedding", dup, 1)
        .select($"neighbor_id").as[Long].collect().toSeq
    }
    // max(qv) picks [1,0] every time -> neighbor 1 every run
    assert(picks.distinct.size == 1 && picks.head == Seq(1L))
  }

  // ---- ShuffleMeter: retried stage attempts must not double-count ------

  test("ShuffleMeter merges retried stage attempts by max, not sum") {
    val meter = new Bench.ShuffleMeter(spark.sparkContext)
    val base = meter.snapshot() // whatever other suites already ran

    // planted retry, shape A: attempt 0 completed with the full volume,
    // a downstream fetch failure re-ran a subset (attempt 1 re-fires
    // onStageCompleted for the SAME stageId with the re-executed tasks'
    // bytes). Round 15's summing meter recorded 941626+677058 here; the
    // plan's true volume is attempt 0's.
    meter.record(1000001, 941626L)
    meter.record(1000001, 677058L)
    // shape B: attempt 0 died before writing, attempt 1 wrote everything
    meter.record(1000002, 0L)
    meter.record(1000002, 80L)
    // unretried stage for good measure
    meter.record(1000003, 7L)

    assert(meter.snapshot() - base == 941626L + 80L + 7L,
      "retried attempts must merge by max per stageId")
  }

  // ---- exactRowBound: structure, never stats (ADVICE r15 medium) -------

  test("exactRowBound reads plan structure: local/range/limit/union/agg") {
    import graft.operators.Joins
    def bound(df: org.apache.spark.sql.DataFrame) =
      Joins.exactRowBound(df.queryExecution.optimizedPlan)
    val local = Seq(1, 2, 3).toDF("x")
    assert(bound(local).contains(BigInt(3)))
    assert(bound(spark.range(7).toDF()).contains(BigInt(7)))
    val scan = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    // a scan's count is a statistic, not a structural fact -> None
    assert(bound(scan).isEmpty)
    // ...but a LIMIT literal over it is a hard bound
    assert(bound(scan.limit(1)).contains(BigInt(1)))
    assert(bound(scan.limit(5).select($"n_name")).contains(BigInt(5)))
    // global aggregate: exactly one row, whatever the input size
    assert(bound(scan.agg(count(lit(1)))).contains(BigInt(1)))
    assert(bound(local.union(Seq(4).toDF("x"))).contains(BigInt(4)))
    assert(bound(local.union(scan.select($"n_nationkey".as("x")))).isEmpty)
  }

  test("provablyUniqueOn accepts limit(1) and global aggregates; assertNoDup probes scans") {
    import graft.operators.Joins
    val scan = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    assert(Joins.provablyUniqueOn(scan.limit(1), Seq("n_nationkey")))
    // the unreadable-shape fallback stays conservative: a full scan is
    // not provably unique even though nation's key IS unique in data
    assert(!Joins.provablyUniqueOn(scan, Seq("n_nationkey")))
    Joins.assertNoDup(scan, Seq("n_nationkey")) // runtime probe, passes
  }

  test("ShuffleMeter still meters real shuffles after the retry fix") {
    val meter = new Bench.ShuffleMeter(spark.sparkContext)
    val nation = spark.read.parquet(s"${SparkTestSession.sfDir}/nation.parquet")
    val s0 = meter.snapshot()
    nation.repartition(4, $"n_regionkey").agg(count(lit(1))).collect()
    val s1 = meter.snapshot()
    assert(s1 - s0 > 0, "repartition wrote no shuffle bytes?")
  }
}
