package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fread

/** JSON-lines source/sink: corrupt-line capture vs failFast, gzip
  * round-trip, and null-field preservation.
  */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    TestTmp.dir(s"graft_jsonl_$tag").toString

  test("gzip roundtrip preserves rows and types under explicit schema") {
    val dir = tmp("gz")
    val df = Seq((1L, "en", "hello"), (2L, "fr", "salut")).toDF("id", "lang", "text")
    Fread.fwriteJsonl(df, dir, compress = "gzip")
    val back = Fread.freadJsonl(spark, dir, schema = Some(StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))))
    assert(back.orderBy($"id").as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "en", "hello"), (2L, "fr", "salut")))
  }

  test("corrupt line lands in _corrupt_record under PERMISSIVE; failFast throws") {
    val dir = tmp("bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"t\": \"ok\"}\nNOT JSON AT ALL\n{\"id\": 2, \"t\": \"fine\"}\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType), StructField("_corrupt_record", StringType)))
    // Spark disallows plans touching ONLY _corrupt_record on raw files;
    // collect full rows once and assert driver-side
    val got = Fread.freadJsonl(spark, dir, schema = Some(schema))
      .select($"id", $"t", $"_corrupt_record").collect()
    assert(got.count(r => !r.isNullAt(2)) == 1)
    assert(got.count(r => !r.isNullAt(0)) == 2)
    intercept[SparkException] {
      Fread.freadJsonl(spark, dir, schema = Some(StructType(schema.fields.take(2))),
        failFast = true).collect()
    }
  }

  test("explicit nulls survive the roundtrip by default; ignoreNulls drops the field") {
    val dir = tmp("nulls")
    val df = Seq((1L, Some("en")), (2L, None)).toDF("id", "lang")
    Fread.fwriteJsonl(df, dir)
    // default keeps "lang": null in the emitted line
    val raw = spark.read.text(dir).as[String].collect().filter(_.nonEmpty)
    assert(raw.exists(_.contains("\"lang\":null")))
    val dir2 = tmp("nonulls")
    Fread.fwriteJsonl(df, dir2, ignoreNulls = true)
    val raw2 = spark.read.text(dir2).as[String].collect().filter(_.nonEmpty)
    assert(!raw2.exists(_.contains("\"lang\"")) || raw2.count(_.contains("\"lang\"")) == 1)
    // either way the typed read surfaces the null row
    val back = Fread.freadJsonl(spark, dir2, schema = Some(StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType)))))
    assert(back.filter($"lang".isNull).select($"id").as[Long].collect().toSeq == Seq(2L))
  }
}

/** fread/fwrite quote="" parity: quoting disabled — a quote char is
  * ordinary data on both sides.
  */
class QuoteDisableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quote=\"\" reads embedded quote chars as data") {
    val dir = TestTmp.dir("graft_noquote").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      "a,b\n1,he said \"hi\" loudly\n2,\"unclosed\n".getBytes("UTF-8"))
    val got = Fread.fread(spark, dir, Fread.FreadOptions(quote = "", sep = ","))
      .orderBy($"a").select($"b").as[String].collect().toSeq
    assert(got == Seq("he said \"hi\" loudly", "\"unclosed"))
  }

  test("fwrite quote=\"\" emits fields verbatim") {
    val dir = TestTmp.dir("graft_noquote_w").toString
    Fread.fwrite(Seq((1, "say \"hi\"")).toDF("a", "b"), dir,
      Fread.FwriteOptions(quote = ""))
    val raw = spark.read.text(dir).as[String].collect().filter(_.startsWith("1"))
    assert(raw.head == "1,say \"hi\"")
  }
}
