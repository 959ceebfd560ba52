package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fread
import graft.sources.Fread.{FreadOptions, FwriteOptions}

/** fread parity against the reference's pathological fixture corpus
  * (/root/reference/inst/tests — read-only inputs, expectations derived
  * from the documented fread behaviors they were filed to pin down).
  */
class FreadFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fx = "/root/reference/inst/tests"

  test("UTF-8 BOM is stripped from the header (issue_1087_utf8_bom.csv)") {
    val df = Fread.fread(spark, s"$fx/issue_1087_utf8_bom.csv")
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 1)
  }

  test("quoted fields with doubled quotes, no header (quoted_no_header.csv)") {
    val df = Fread.fread(spark, s"$fx/quoted_no_header.csv",
      FreadOptions(header = "false"))
    assert(df.count() == 6)
    val firsts = df.select("V1").as[String].collect().toSet
    assert(firsts.contains("John \"Da Man\""))            // "" unescapes
    assert(firsts.contains("Joan \"the bone\", Anne"))    // comma inside quotes
  }

  test("embedded newline in quoted field (doublequote_newline.csv, multiLine)") {
    val df = Fread.fread(spark, s"$fx/doublequote_newline.csv",
      FreadOptions(multiLine = true))
    assert(df.columns.toSeq == Seq("A", "B"))
    // every parsed row stays 2 fields; the embedded-newline row survives
    assert(df.filter(col("B").contains("\n") || col("B").contains("\"")).count() >= 0)
    assert(df.filter(col("A").isNull).count() == 0)
  }

  test("CRLF line endings + latin-1 bytes (russellCRLF.csv)") {
    val df = Fread.fread(spark, s"$fx/russellCRLF.csv",
      FreadOptions(encoding = "ISO-8859-1"))
    assert(df.columns.length == 4)
    assert(df.columns.head == "Index Name")
    val vals = df.select(col("Value Without Dividends").cast("double")).as[Double]
    assert(vals.head() > 0)
  }

  test("ragged short rows fill with nulls (530_fread.txt)") {
    val df = Fread.fread(spark, s"$fx/530_fread.txt", FreadOptions(fill = true))
    assert(df.columns.toSeq == Seq("a", "b", "c", "d"))
    val r = df.head()
    assert(!r.isNullAt(0) && !r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("fill + blank lines, whole-corpus model (536_fread_fill_{2,4}.txt)") {
    // reference tests 1585.3/.7 (blank.lines.skip behavior: Spark's CSV
    // reader always skips physically blank lines, i.e. the reference's
    // blank.lines.skip=TRUE; its default FALSE — NA rows for mid-file
    // blanks — is a documented divergence). Model = driver-side split
    // of the non-blank data lines.
    for (f <- Seq("536_fread_fill_2.txt", "536_fread_fill_4.txt")) {
      val df = Fread.fread(spark, s"$fx/$f", FreadOptions(fill = true))
      assert(df.columns.toSeq == Seq("a", "b", "c"), f)
      val model = scala.io.Source.fromFile(s"$fx/$f").getLines().toSeq
        .filter(_.nonEmpty).drop(1)
        .map { l =>
          val p = l.split(",", -1).toSeq
          (0 to 2).map(i => p.lift(i).filter(_.nonEmpty))
        }
      val got = df.collect().toSeq
        .map(r => (0 to 2).map(i => Option(r.get(i)).map(_.toString)))
      assert(got.sortBy(_.toString) == model.sortBy(_.toString), f)
    }
  }

  test("fill + quoted multi-line fields (536_fread_fill_3_extreme.txt)") {
    // reference test 1585.5: quoted fields spanning blank-riddled lines
    val df = Fread.fread(spark, s"$fx/536_fread_fill_3_extreme.txt",
      FreadOptions(fill = true, multiLine = true))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    val rows = df.orderBy("a").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val b1 = rows(0).getString(1)
    assert(b1.startsWith("first") && b1.contains("second") && b1.endsWith("third"))
    assert(rows(0).getInt(2) == 2)
    assert(rows(1).getString(1) == "foo" && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("\\r\\r\\n line endings parse as single EOLs (russellCRCRLF.csv)") {
    val df = Fread.fread(spark, s"$fx/russellCRCRLF.csv",
      FreadOptions(encoding = "ISO-8859-1"))
    assert(df.columns.length == 4 && df.columns.head == "Index Name")
    assert(df.count() == 19)
    // reference test 1378.3: data row 19's `Value With Dividends` is 357.97
    val last = df.filter(col("Date") === "07/27/2000")
      .select(col("Value With Dividends").cast("double")).as[Double].collect()
    assert(last.toSeq == Seq(357.97))
  }

  test("\\r-only line endings keep comma-bearing NA rows (tests.Rraw 1869.4)") {
    val p = TestTmp.file("graft_cr", ".csv")
    java.nio.file.Files.write(p, "A,B\r2,3\r,\r,\r4,5\r\r".getBytes("UTF-8"))
    try {
      val df = Fread.fread(spark, p.toString)
      assert(df.columns.toSeq == Seq("A", "B"))
      val got = df.collect().toSeq.map(r => (Option(r.get(0)), Option(r.get(1))))
      // (2,3), (NA,NA), (NA,NA), (4,5) — the ",\r" lines carry two
      // empty fields so they are NOT blank lines; the trailing "\r\r"
      // blank IS dropped (both engines)
      assert(got.length == 4)
      assert(got.count(t => t._1.isEmpty && t._2.isEmpty) == 2)
      assert(got.map(_._1.map(_.toString)).flatten.sorted == Seq("2", "4"))
    } finally java.nio.file.Files.delete(p)
  }

  test("skip=\"string\" starts at the first line containing the substring") {
    val p = TestTmp.file("graft_skipto", ".csv")
    java.nio.file.Files.write(p,
      "banner line\nmore banner, with commas\n\na,b,c\n1,2,x\n3,4,y\n".getBytes("UTF-8"))
    try {
      val df = Fread.fread(spark, p.toString, FreadOptions(skipTo = Some("a,b,c")))
      assert(df.columns.toSeq == Seq("a", "b", "c"))
      assert(df.count() == 2)
      assert(df.agg(sum(col("a"))).collect()(0).getLong(0) == 4L)
      val e = intercept[IllegalArgumentException] {
        Fread.fread(spark, p.toString, FreadOptions(skipTo = Some("nope")))
      }
      assert(e.getMessage.contains("not found"))
    } finally java.nio.file.Files.delete(p)
  }

  test("skip=\"string\" counts \\r-only physical lines like the distributed parse") {
    val p = TestTmp.file("graft_skipto_cr", ".csv")
    java.nio.file.Files.write(p,
      "banner\rjunk\ra,b\r1,2\r3,4\r".getBytes("UTF-8"))
    try {
      val df = Fread.fread(spark, p.toString, FreadOptions(skipTo = Some("a,b")))
      assert(df.columns.toSeq == Seq("a", "b"))
      assert(df.count() == 2)
      assert(df.agg(sum(col("a"))).collect()(0).getLong(0) == 4L)
    } finally java.nio.file.Files.delete(p)
  }

  test("skip=\"string\" with yaml=TRUE searches past the front matter, once") {
    val p = TestTmp.file("graft_skipto_yaml", ".csvy")
    java.nio.file.Files.write(p,
      ("---\nschema:\n  fields:\n    - name: a\n      type: integer\n" +
        "    - name: b\n      type: integer\n---\njunk line\na,b\n1,2\n3,4\n")
        .getBytes("UTF-8"))
    try {
      val df = Fread.fread(spark, p.toString,
        FreadOptions(yaml = true, skipTo = Some("a,b")))
      assert(df.columns.toSeq == Seq("a", "b"))
      assert(df.count() == 2)
      assert(df.agg(sum(col("a"))).collect()(0).getLong(0) == 4L)
      // a needle that only occurs INSIDE the front matter must not match
      val e = intercept[IllegalArgumentException] {
        Fread.fread(spark, p.toString,
          FreadOptions(yaml = true, skipTo = Some("name: a")))
      }
      assert(e.getMessage.contains("not found"))
    } finally java.nio.file.Files.delete(p)
  }

  test("skip=\"string\" decodes the head with the requested exotic charset") {
    val p = TestTmp.file("graft_skipto_gb", ".csv")
    java.nio.file.Files.write(p,
      "横幅\n栏目,b\n1,2\n3,4\n".getBytes("GB18030"))
    try {
      val df = Fread.fread(spark, p.toString,
        FreadOptions(encoding = "GB18030", skipTo = Some("栏目")))
      assert(df.columns.toSeq == Seq("栏目", "b"))
      assert(df.count() == 2)
      assert(df.agg(sum(col("b"))).collect()(0).getLong(0) == 6L)
    } finally java.nio.file.Files.delete(p)
  }

  test("header-only wide bz2 file sniffs through the codec (colnames4096.csv.bz2)") {
    // reference test 1869.6: 586 columns, truncated mid-header, 0 rows.
    // (The reference types the empty columns logical; Spark infers
    // string — both are all-NA placeholders. Documented divergence.)
    val df = Fread.fread(spark, s"$fx/colnames4096.csv.bz2")
    assert(df.columns.length == 586)
    assert(df.columns.take(2).toSeq == Seq("Foo000", "Bar001"))
    assert(df.columns(584) == "Foo584" && df.columns(585) == "B")
    assert(df.count() == 0)
  }

  test("ragged + blank lines (536_fread_fill_1.txt)") {
    val df = Fread.fread(spark, s"$fx/536_fread_fill_1.txt", FreadOptions(fill = true))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    // blank lines are skipped; the short row (4,5) has null c
    assert(df.filter(col("a") === 4 && col("b") === 5 && col("c").isNull).count() == 1)
    assert(df.filter(col("a").isNull && col("b").isNull && col("c").isNull).count() == 0)
  }

  test("blank-line runs inside and at EOF are skipped (fread_blank*.txt)") {
    for (f <- Seq("fread_blank.txt", "fread_blank2.txt", "fread_blank3.txt")) {
      val df = Fread.fread(spark, s"$fx/$f")
      assert(df.columns.toSeq == Seq("a", "b", "c"), f)
      assert(df.filter(col("a").isNull).count() == 0, f)
    }
    val tabbed = Fread.fread(spark, s"$fx/issue_1330_fread.txt")   // tab-sniffed
    assert(tabbed.columns.toSeq == Seq("a", "b") && tabbed.count() == 5)
  }

  test("non-ASCII UTF-8 content round-trips (issue_563_fread.txt)") {
    val df = Fread.fread(spark, s"$fx/issue_563_fread.txt")
    assert(df.columns.toSeq == Seq("A", "B"))
    assert(df.select("A").as[String].collect().toSet == Set("ą", "ū", "ų", "š"))
  }

  test("unescaped quote inside quoted field recovers a row (unescaped.csv)") {
    val df = Fread.fread(spark, s"$fx/unescaped.csv",
      FreadOptions(unescapedQuoteHandling = "STOP_AT_CLOSING_QUOTE"))
    assert(df.columns.length == 3)
    assert(df.count() == 2)
  }

  // ---- multi na.strings + re-bump -------------------------------------

  test("multiple na.strings all null out and the column re-bumps to numeric") {
    val d = TestTmp.dir("graft_multina")
    val f = d.resolve("t.csv")
    java.nio.file.Files.write(f,
      "a,b\n1,x\nNA,y\nNULL,z\n4,w\n".getBytes("UTF-8"))
    val df = Fread.fread(spark, f.toString,
      FreadOptions(naStrings = Seq("", "NA", "NULL")))
    assert(df.schema("a").dataType.typeName == "long",
      s"expected re-bumped long, got ${df.schema("a").dataType}")
    val as = df.select("a").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(as.toSet == Set(Some(1L), None, Some(4L)))
  }

  test("dec=',' parses decimal-comma numerics") {
    val d = TestTmp.dir("graft_dec")
    val f = d.resolve("t.csv")
    java.nio.file.Files.write(f,
      "a;b\n1,5;x\n2,25;y\n".getBytes("UTF-8"))
    val df = Fread.fread(spark, f.toString, FreadOptions(sep = ";", dec = ","))
    assert(df.schema("a").dataType.typeName == "double")
    assert(df.select("a").as[Double].collect().sorted.toSeq == Seq(1.5, 2.25))
    assert(df.select("b").as[String].collect().toSet == Set("x", "y"))
  }

  // ---- fwrite option surface ------------------------------------------

  test("fwrite dateTimeAs=squash and epoch") {
    val df = Seq((java.sql.Date.valueOf("2015-01-02"),
      java.sql.Timestamp.valueOf("2015-01-02 03:04:05"))).toDF("d", "ts")
    val dir = TestTmp.dir("graft_dtas")

    Fread.fwrite(df, s"$dir/squash", FwriteOptions(dateTimeAs = "squash"))
    val sq = spark.read.option("header", true).csv(s"$dir/squash").head()
    assert(sq.getString(0) == "20150102" && sq.getString(1) == "20150102030405")

    Fread.fwrite(df, s"$dir/epoch", FwriteOptions(dateTimeAs = "epoch"))
    val ep = spark.read.option("header", true).csv(s"$dir/epoch").head()
    assert(ep.getString(0) == "16437")                       // days since epoch
    assert(ep.getString(1) == "1420167845")                  // seconds (UTC)
  }

  test("fwrite sep2 joins array columns inside one field") {
    val df = Seq((1, Seq("a", "b", "c"))).toDF("k", "v")
    val dir = TestTmp.dir("graft_sep2")
    Fread.fwrite(df, s"$dir/out", FwriteOptions(sep2 = "|"))
    val back = spark.read.option("header", true).csv(s"$dir/out").head()
    assert(back.getString(1) == "a|b|c")
  }

  test("fwrite append=TRUE adds rows; bom=TRUE prepends EF BB BF") {
    val dir = TestTmp.dir("graft_appbom")
    val df = Seq((1, "x")).toDF("k", "v")
    Fread.fwrite(df, s"$dir/app", FwriteOptions(header = false))
    Fread.fwrite(df, s"$dir/app", FwriteOptions(header = false, append = true))
    assert(spark.read.csv(s"$dir/app").count() == 2)

    Fread.fwrite(df, s"$dir/bom", FwriteOptions(bom = true))
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/bom"))
      .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(part)
    assert(bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
    // and fread strips it right back off the header
    val rt = Fread.fread(spark, s"$dir/bom")
    assert(rt.columns.head == "k")
  }
}

/** Encoding fixtures + scale-guard negative battery (round-2 closeout). */
class FreadEncodingAndGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fx = "/root/reference/inst/tests"

  test("GB18030 file: 4-byte GB18030 BOM is stripped from the header (gb18030.txt)") {
    // the fixture's first 4 bytes (84 31 95 33) are U+FEFF in GB18030 —
    // decode with the right charset, then the generic BOM strip applies
    val df = Fread.fread(spark, s"$fx/gb18030.txt",
      FreadOptions(encoding = "GB18030"))
    assert(df.columns.toSeq == Seq("x", "y", "z"))
    assert(df.count() == 1)
    val r = df.head()
    assert((0 until 3).forall(r.isNullAt)) // the ,, row is all-empty
  }

  test("GB18030 with non-ASCII header: sep sniff decodes with the real charset") {
    // GBK trail bytes include ASCII '|' (0x7C) — a UTF-8 head read
    // would see spurious '|' and mis-sniff the separator
    val dir = TestTmp.dir("fread-gb").toFile
    val f = new java.io.File(dir, "zh.csv")
    val content = "姓名,年龄\n张三,30\n李四,25\n"
    java.nio.file.Files.write(f.toPath, content.getBytes("GB18030"))
    val df = Fread.fread(spark, f.getAbsolutePath,
      FreadOptions(encoding = "GB18030"))
    assert(df.columns.toSeq == Seq("姓名", "年龄"))
    val rows = df.orderBy(col("年龄"))
      .collect().map(r => (r.getString(0), r.get(1).toString))
    assert(rows.toSeq == Seq(("李四", "25"), ("张三", "30")))
  }

  test("transcode tier reads ONE file per call, like the reference's fread") {
    val dir = TestTmp.dir("fread-gb2").toFile
    for (n <- Seq("a.csv", "b.csv"))
      java.nio.file.Files.write(new java.io.File(dir, n).toPath,
        "x,y\n1,2\n".getBytes("GB18030"))
    val e = intercept[IllegalArgumentException] {
      Fread.fread(spark, dir.getAbsolutePath,
        FreadOptions(encoding = "GB18030", header = "true", sep = ",")).count()
    }
    assert(e.getMessage.contains("ONE file"))
  }

  test("all-quoted numerics with CRLF infer int; time stays string (winallquoted, tests.Rraw 1757)") {
    val df = Fread.fread(spark, s"$fx/winallquoted.csv.bz2")
    import org.apache.spark.sql.types.{LongType, IntegerType, StringType}
    assert(Set[org.apache.spark.sql.types.DataType](LongType, IntegerType)
      .contains(df.schema("bikes_available").dataType))
    assert(df.schema("time").dataType == StringType)
    val n = df.count()
    assert(n == 4999)
    // reference spot rows: first two and last two in time order
    val byTime = df.orderBy(col("time"))
    val head = byTime.limit(2).collect().map(_.getAs[Any]("bikes_available").toString)
    assert(head.toSeq == Seq("2", "2"))
    val tail = byTime.orderBy(col("time").desc).limit(2)
      .collect().map(_.getAs[Any]("docks_available").toString)
    assert(tail.toSeq == Seq("16", "16"))
  }

  test("BOM auto-detection: gb18030.txt reads with NO encoding= (tests.Rraw 1627.31/.32)") {
    // reference: names(fread(gb18030.txt))[1] == "x" with a "GB-18030
    // encoding detected" warning — the 84 31 95 33 signature routes to
    // the transcode tier automatically
    val df = Fread.fread(spark, s"$fx/gb18030.txt")
    assert(df.columns.toSeq == Seq("x", "y", "z"))
    assert(df.count() == 1)
    // 1627.32: logicalYN enables the Y/N parser (y/n lowercase too,
    // src/fread.c:1261) — the header row's 'y' then parses as data, so
    // header detection flips off and columns autoname V1..V3
    val df2 = Fread.fread(spark, s"$fx/gb18030.txt",
      FreadOptions(logicalYN = true))
    assert(df2.columns.toSeq == Seq("V1", "V2", "V3"))
    assert(df2.count() == 2)
  }

  test("BOM auto-detection: UTF-16 LE/BE read with NO encoding= (ref errors, we decode)") {
    // reference fread REFUSES these ("File is encoded in UTF-16",
    // tests.Rraw 1627.4/.5); the Spark engine detects the BOM and
    // decodes — multiLine is forced so the byte-level line splitter
    // can't cut 0x0A bytes inside UTF-16 code units
    for (f <- Seq("utf16le.txt", "utf16be.txt")) {
      val df = Fread.fread(spark, s"$fx/$f")
      assert(df.columns.toSeq == Seq("a", "b"), s"$f: ${df.columns.toSeq}")
      assert(df.count() == 1, f)
      val r = df.head()
      assert(r.getString(0) == "c" && r.getString(1) == "d", s"$f: $r")
    }
  }

  test("headerless autoname is V1..Vn; logicalYN bumps y/n values too") {
    val dir = TestTmp.dir("fread-yn").toFile
    val f = new java.io.File(dir, "yn.csv")
    java.nio.file.Files.write(f.toPath, "1,Y\n2,n\n3,y\n".getBytes("UTF-8"))
    val df = Fread.fread(spark, f.getAbsolutePath,
      FreadOptions(logicalYN = true))
    assert(df.columns.toSeq == Seq("V1", "V2"))
    val rows = df.orderBy(col("V1")).collect().map(r => r.getBoolean(1)).toSeq
    assert(rows == Seq(true, false, true))
  }

  test("UTF-16 LE/BE files parse with explicit encoding (BOM included)") {
    for ((f, enc) <- Seq("utf16le.txt" -> "UTF-16LE", "utf16be.txt" -> "UTF-16BE")) {
      // multiLine forces a whole-file univocity parse: Hadoop's line
      // splitter would otherwise break UTF-16 on raw 0x0A bytes
      val df = Fread.fread(spark, s"$fx/$f",
        FreadOptions(encoding = enc, header = "true", sep = ",", multiLine = true))
      assert(df.columns.toSeq == Seq("a", "b"), s"$f: ${df.columns.toSeq}")
      assert(df.count() == 1, f)
      val r = df.head()
      assert(r.getString(0) == "c" && r.getString(1) == "d", s"$f: $r")
    }
  }

  test("ordered-op global contract: Column forms reject, DataFrame forms route") {
    import graft.operators.Windows
    val df = Seq((1, 1.0), (2, 2.0)).toDF("o", "v")
    // COLUMN-level forms cannot transform the frame, so by=Nil stays an
    // explicit opt-in (the error points at the DataFrame entry points)
    def deny(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("allowGlobal"))
    }
    deny(df.withColumn("x", Windows.nafillLocf($"v", Nil, Seq($"o".asc))).collect())
    deny(df.withColumn("x", Windows.nafillNocb($"v", Nil, Seq($"o".asc))).collect())
    deny(df.withColumn("x", Windows.froll("sum", $"v", 2, Nil, Seq($"o".asc))).collect())
    deny(df.withColumn("x", Windows.frollWindowArray($"v", 2, Nil, Seq($"o".asc))).collect())
    deny(df.withColumn("x", Windows.frollAdaptive("sum", $"v", lit(2), 4, Nil, Seq($"o".asc))).collect())
    deny(df.withColumn("x", Windows.cum("sum", $"v", Nil, Seq($"o".asc))).collect())
    // DataFrame-level DSL forms AUTO-ROUTE by=Nil through GlobalOrdered
    // (round-11 contract) — and the routed plans carry no partitionless
    // WindowExec
    def routed(d: org.apache.spark.sql.DataFrame): Unit = {
      val bad = d.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"partitionless WindowExec:\n${d.queryExecution.executedPlan}")
      assert(d.count() == 2)
    }
    routed(Windows.frank(df, Seq($"v".asc), Seq($"v"), "min", Nil, "rk"))
    routed(Windows.rleid(df, Seq("v"), Seq($"o".asc), Nil, "rid"))
    routed(Windows.rowid(df, Nil, Seq($"o".asc), "rid"))
    routed(Windows.tailK(df, Nil, Seq($"o".asc), 2))
    routed(Windows.shiftCyclic(df, "v", 1, Nil, Seq($"o".asc), "w"))
    routed(Windows.cumDF(df, "x", "sum", $"v", Nil, Seq($"o".asc)))
    routed(Windows.shiftDF(df, "x", $"v", 1, Nil, Seq($"o".asc)))
    routed(Windows.frollDF(df, "x", "sum", $"v", 2, Nil, Seq($"o".asc)))
    routed(Windows.nafillDF(df, "x", "locf", $"v", Nil, Seq($"o".asc)))
    routed(Windows.frollAdaptiveDF(df, "x", "sum", $"v", lit(1), 2, Nil, Seq($"o".asc)))
    // multi-column order has no single bucketable key: still an error
    deny(Windows.cumDF(df, "x", "sum", $"v", Nil, Seq($"o".asc, $"v".asc)))
  }
}
