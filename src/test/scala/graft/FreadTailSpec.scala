package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fread
import graft.sources.Fread.FreadOptions

/** Round-4 fread tail: csvy front matter (R/fread.R yaml=), >64 KB first
  * line, and the out-of-sample type-bump re-read (src/fread.c:126-128).
  */
class FreadTailSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val csvy = "/root/reference/inst/tests/csvy"
  private val tmp = {
    val d = new java.io.File("target/fread-tail")
    d.mkdirs(); d.getAbsolutePath
  }

  test("csvy: schema + types from front matter (test.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test.csvy", FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("var1", "var2", "var3"))
    assert(df.schema("var2").dataType == LongType)
    assert(df.schema("var3").dataType == DoubleType)
    val rows = df.orderBy("var1").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "A" && rows(0).getLong(1) == 1L && rows(0).getDouble(2) == 2.5)
  }

  test("csvy: top-level sep/dec/quote/na.strings keys (test_attributes.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test_attributes.csvy", FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("var1", "var2", "var3"))
    val rows = df.orderBy("var1").collect()
    assert(rows.length == 2)
    // quote ' stripped; dec , normalized; @ nulled
    assert(rows(0).getString(0) == "A")
    assert(rows(0).getLong(1) == 1L)
    assert(rows(0).getDouble(2) == 2.5)
    assert(rows(1).isNullAt(1))
    assert(rows(1).getDouble(2) == 4.3)
  }

  test("csvy: '#'-commented front matter (test_comment.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test_comment.csvy", FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("var1", "var2", "var3"))
    assert(df.count() == 2)
    assert(df.schema("var2").dataType == LongType)
  }

  test("csvy: missing type defaults to string (test_missing_type.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test_missing_type.csvy", FreadOptions(yaml = true))
    assert(df.schema("var1").dataType == StringType)
    assert(df.schema("var2").dataType == LongType)
    assert(df.count() == 2)
  }

  test("csvy: blank lines between fence and data (test_skip.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test_skip.csvy", FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("var1", "var2", "var3"))
    assert(df.count() == 2)
  }

  test("csvy: extraneous top-level keys are ignored (test_extraneous.csvy)") {
    val df = Fread.fread(spark, s"$csvy/test_extraneous.csvy", FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("Date", "WTI"))
    assert(df.count() == 22)
  }

  test("csvy: explicit user args override the yaml block (test_override_sep.csvy)") {
    // yaml says sep: "-" which is wrong for the data; user overrides to |
    val df = Fread.fread(spark, s"$csvy/test_override_sep.csvy",
      FreadOptions(yaml = true, sep = "|"))
    assert(df.columns.toSeq == Seq("var1", "var2", "var3"))
    assert(df.count() == 2)
  }

  test("csvy: unterminated front matter is an error (test_incomplete_header.csvy)") {
    val e = intercept[IllegalArgumentException] {
      Fread.fread(spark, s"$csvy/test_incomplete_header.csvy", FreadOptions(yaml = true))
    }
    assert(e.getMessage.contains("unterminated"))
  }

  test(">64 KB first line: sep sniff + header still work") {
    // header row with enough wide columns to pass 64 KB before any newline
    val wide = (1 to 9000).map(i => f"colname_$i%06d").mkString(";")
    assert(wide.length > 65536)
    val f = new java.io.File(tmp, "widehead.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println(wide)
    w.println((1 to 9000).mkString(";"))
    w.close()
    val line1 = Fread.firstLine(spark, f.getAbsolutePath)
    assert(line1.length > 65536, "first line must not truncate at 64 KB")
    val df = Fread.fread(spark, f.getAbsolutePath)
    assert(df.columns.length == 9000)
    assert(df.columns.head == "colname_000001")
    assert(df.count() == 1)
  }

  test("type-bump re-read: out-of-sample double bumps the int column (samplingRatio)") {
    // first 1000 rows pure int, a late row is fractional — a small
    // inference sample types the column INT, the late row then fails to
    // parse and must trigger the full re-read with the bumped type
    val f = new java.io.File(tmp, "bump.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("id,v")
    (1 to 5000).foreach(i => w.println(s"$i,7"))
    w.println("5001,2.5")
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(samplingRatio = 0.01))
    assert(df.schema("v").dataType == DoubleType,
      s"expected bumped DOUBLE, got ${df.schema("v").dataType}")
    assert(df.count() == 5001)
    assert(df.agg(sum("v")).head().getDouble(0) == 5000 * 7 + 2.5)
    // id column re-bumps back to integral
    assert(df.schema("id").dataType == LongType)
  }

  test("type-bump re-read: boolean column survives the all-string re-read") {
    val f = new java.io.File(tmp, "bumpbool.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("k,flag,v")
    (1 to 5000).foreach(i => w.println(s"$i,${i % 2 == 0},3"))
    w.println("5001,true,9.25")
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(samplingRatio = 0.01))
    assert(df.schema("flag").dataType == BooleanType)
    assert(df.schema("v").dataType == DoubleType)
    assert(df.filter(col("flag")).count() == 2501)
  }

  test("samplingRatio=1.0 (default) never probes or re-reads") {
    val f = new java.io.File(tmp, "nobump.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("a,b"); w.println("1,x"); w.println("2.5,y")
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath)
    assert(df.schema("a").dataType == DoubleType)   // full-scan inference is already right
    assert(df.count() == 2)
  }

  // ---- round-4 review fixes ---------------------------------------------

  test("csvy: '- name:' items outside schema.fields add no phantom columns") {
    val f = new java.io.File(tmp, "scoped.csvy")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print("""---
               |schema:
               |  fields:
               |  - name: var1
               |    type: string
               |    constraints:
               |      - required: true
               |  - name: var2
               |    type: integer
               |sources:
               |  - name: "Some Source"
               |    path: data.csv
               |resources:
               |  type: csv
               |---
               |var1,var2
               |A,1
               |B,2
               |""".stripMargin)
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(yaml = true))
    assert(df.columns.toSeq == Seq("var1", "var2"),
      "metadata list items must not become columns")
    assert(df.schema("var2").dataType == LongType,
      "a 'type:' key in a later section must not re-type the last field")
    assert(df.count() == 2)
  }

  test("csvy: na.strings YAML inline-list form nulls every listed token") {
    val f = new java.io.File(tmp, "nalist.csvy")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print("""---
               |schema:
               |  fields:
               |  - name: k
               |    type: string
               |  - name: v
               |    type: string
               |na.strings: ["@", "."]
               |---
               |k,v
               |a,@
               |b,.
               |c,ok
               |""".stripMargin)
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(yaml = true))
    val vs = df.orderBy("k").select("v").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(vs == Seq(null, null, "ok"), s"got $vs")
  }

  test("type-bump re-read restores sampler-inferred date columns") {
    val f = new java.io.File(tmp, "bumpdate.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("id,d,v")
    (1 to 5000).foreach(i => w.println(f"$i,2024-01-${i % 28 + 1}%02d,7"))
    w.println("5001,2024-02-01,2.5")   // bumps v int→double; d must stay DATE
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(samplingRatio = 0.01))
    assert(df.schema("v").dataType == DoubleType)
    assert(df.schema("d").dataType == DateType,
      s"inferred DateType must survive the all-string re-read, got ${df.schema("d").dataType}")
    assert(df.count() == 5001)
  }

  test("csvy: declared 'number' stays DOUBLE under dec downgrade even if all values integral") {
    val f = new java.io.File(tmp, "decint.csvy")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print("""---
               |schema:
               |  fields:
               |  - name: k
               |    type: string
               |  - name: x
               |    type: number
               |dec: ","
               |sep: ";"
               |---
               |k;x
               |a;4
               |b;7
               |""".stripMargin)
    w.close()
    val df = Fread.fread(spark, f.getAbsolutePath, FreadOptions(yaml = true))
    assert(df.schema("x").dataType == DoubleType,
      s"declared number must stay DOUBLE, got ${df.schema("x").dataType}")
    assert(df.agg(sum("x")).head().getDouble(0) == 11.0)
  }

  test("cap-hit head read returns the truncated prefix, not empty") {
    // one giant line with NO newline: firstLine must return the prefix
    // so sep sniffing has material to work with
    val f = new java.io.File(tmp, "noline.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print(("a;b;c;" * 50000).take(200000))   // 200 KB, no newline
    w.close()
    val line = Fread.firstLine(spark, f.getAbsolutePath)
    assert(line.nonEmpty, "EOF-terminated unterminated line must be returned")
    assert(Fread.sniffSepFrom(line) == ";")
  }
}
