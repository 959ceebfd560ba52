package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.UnicodeNormalize

/** Unicode normalization kernel: NFC composes combining marks, NFKC
  * additionally folds compatibility variants; codegen and SQL-function
  * paths agree with interpreted eval.
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("NFC: decomposed e+COMBINING ACUTE == composed U+00E9; dedup keys converge") {
    val df = Seq((1, "café"), (2, "café")).toDF("id", "t")
    val out = df.select(UnicodeNormalize.nfc($"t").as("n"))
      .distinct().as[String].collect().toSeq
    assert(out == Seq("caf\u00e9"),
      "both encodings must normalize to ONE composed form")
  }

  test("NFKC folds width/ligature variants NFC leaves alone") {
    val df = Seq("ﬁle", "ｆｕｌｌ").toDF("t")  // U+FB01 ligature, fullwidth
    val nfkc = df.select(UnicodeNormalize.nfkc($"t").as("n")).as[String].collect().toSeq
    assert(nfkc == Seq("file", "full"))
    val nfc = df.select(UnicodeNormalize.nfc($"t").as("n")).as[String].collect().toSeq
    assert(nfc == Seq("ﬁle", "ｆｕｌｌ"), "NFC must NOT fold compatibility forms")
  }

  test("SQL registration + null passthrough") {
    graft.plans.GraftExtensions.register(spark)
    Seq((1, Some("café")), (2, None: Option[String])).toDF("id", "t")
      .createOrReplaceTempView("norm_probe")
    val got = spark.sql(
      "SELECT graft_normalize(t, 'NFC') AS n FROM norm_probe ORDER BY id")
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("caf\u00e9"), None))
  }

  test("bad form is refused") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(org.apache.spark.sql.GraftSqlBridge.expression(lit("x")), "NFX")
    }
  }
}

/** canonicalizeUnicode: NFKC pre-pass + ASCII squeeze = one dedup key
  * across encoding variants.
  */
class CanonicalizeUnicodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fullwidth / ligature / decomposed variants share a canonical key") {
    val df = Seq("full text", "ｆｕｌｌ text", "fulﬂ text short")
      .toDF("t")
    val keys = df.select(graft.text.TextFunctions.canonicalizeUnicode($"t").as("k"))
      .as[String].collect().toSeq
    assert(keys(0) == keys(1), s"fullwidth must fold: $keys")
    assert(keys(2) == "fulfl text short", s"ligature must fold to its letters: $keys")
  }
}
