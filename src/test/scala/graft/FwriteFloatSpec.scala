package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Dtoa, Fread}

/** fwrite float-formatting parity (src/fwrite.c:184-324 writeFloat64):
  * expected strings are pinned verbatim from the reference's own test
  * suite — tests.Rraw 2112.01-.13 (#2020 scipen), 1658.23, 1658.34,
  * 1658.45, 2112.12 — plus boundary cases the algorithm implies.
  */
class FwriteFloatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def f(x: Double, scipen: Int = 0): String =
    Dtoa.formatString(x, scipen)

  // ---- tests.Rraw 2112.01-.11: the scipen width rule ------------------

  test("scipen=0 default: 1e-04, 1e+06, -20 (tests.Rraw 2112.01)") {
    assert(f(0.0001) == "1e-04")
    assert(f(1e6) == "1e+06")
    assert(f(-20.0) == "-20")
  }

  test("scipen widens the decimal window one character at a time (2112.03-.11)") {
    // scipen=1: a=0.0001 goes decimal, b=1e6 stays scientific
    assert(f(0.0001, 1) == "0.0001" && f(1e6, 1) == "1e+06" && f(-20.0, 1) == "-20")
    // scipen=2: both decimal
    assert(f(0.0001, 2) == "0.0001" && f(1e6, 2) == "1000000")
    // scipen=999: everything decimal
    assert(f(0.0001, 999) == "0.0001" && f(1e6, 999) == "1000000" && f(-20.0, 999) == "-20")
    // negative scipen penalizes decimal: -20 flips at scipen=-4
    assert(f(-20.0, -3) == "-20")
    assert(f(-20.0, -4) == "-2e+01")
    assert(f(-20.0, -999) == "-2e+01")
    assert(f(0.0001, -3) == "1e-04" && f(1e6, -3) == "1e+06")
  }

  // ---- tests.Rraw 2112.12: 3-digit exponents, pi at 15 s.f. ------------

  test("powers of ten across the range (2112.12)") {
    assert(f(0.0) == "0")
    assert(f(1e-300) == "1e-300")
    assert(f(1e-200) == "1e-200")
    assert(f(1e-100) == "1e-100")
    assert(f(1.0) == "1")
    assert(f(1e100) == "1e+100")
    assert(f(1e200) == "1e+200")
    assert(f(1e300) == "1e+300")
    assert(f(Double.PositiveInfinity) == "Inf")
    assert(f(Double.NegativeInfinity) == "-Inf")
    assert(f(math.Pi) == "3.14159265358979")
  }

  test("scipen=999 stretches tiny/huge magnitudes fully decimal (2112.13)") {
    assert(f(1e-100, 999) == "0." + "0" * 99 + "1")
    assert(f(1e-300, 999) == "0." + "0" * 299 + "1")
    assert(f(1e100, 999) == "1" + "0" * 100)
    assert(f(1e300, 999) == "1" + "0" * 300)
  }

  // ---- tests.Rraw 1658.23/.34/.45: 15 s.f. + plain decimals ------------

  test("15 significant figures, trailing zeros stripped (1658.23/.34/.45)") {
    assert(f(1 / 0.9) == "1.11111111111111")
    assert(f(1.1) == "1.1")
    assert(f(9.9) == "9.9")
    assert(f(3.14) == "3.14")
    assert(f(1e12) == "1e+12")
    assert(f(0.1 + 0.2) == "0.3") // 0.30000000000000004 rounds clean at 15 s.f.
  }

  // ---- algorithm-implied boundaries -----------------------------------

  test("NaN is the na value; zeros and sign handling") {
    assert(f(Double.NaN) == null)
    assert(f(-0.0) == "0")
    assert(f(-1.5) == "-1.5")
  }

  test("single-digit scientific has no decimal sep; exponent always signed 2+ digits") {
    assert(f(7e-4) == "7e-04")
    assert(f(-7e-4) == "-7e-04")
    assert(f(1.5e-5) == "1.5e-05")
    assert(f(123.456) == "123.456")
    assert(f(0.0072) == "0.0072")
    assert(f(30460.0) == "30460")
  }

  test("rounding carry adds a digit cleanly (sf==0 path of the reference)") {
    // 16 nines: rounds at 15 s.f. to 10.0 → "10"
    assert(f(9.999999999999999) == "10")
    assert(f(0.9999999999999999) == "1")
  }

  // ---- end-to-end through fwrite --------------------------------------

  test("fwrite writes reference float format; scipen= flows through; NaN -> na") {
    val dir = TestTmp.path("graft_fwrite_float")
    val df = Seq((1L, 0.0001, 1e6, -20.0), (2L, Double.NaN, 0.0, 1 / 0.9))
      .toDF("id", "a", "b", "c")
    Fread.fwrite(df, dir, Fread.FwriteOptions(na = "NA"))
    val lines = spark.read.textFile(dir).collect().toSeq.sorted
    assert(lines.contains("1,1e-04,1e+06,-20"), lines.mkString("|"))
    assert(lines.contains("2,NA,0,1.11111111111111"), lines.mkString("|"))

    Fread.fwrite(df, dir, Fread.FwriteOptions(na = "NA", scipen = 2))
    val lines2 = spark.read.textFile(dir).collect().toSeq.sorted
    assert(lines2.contains("1,0.0001,1000000,-20"), lines2.mkString("|"))
  }

  // ---- dec=',' (src/fwrite.c:38; tests.Rraw 1733.2, 2281, 2337) --------

  test("dec=',' replaces the decimal sep in every float form (1733.2)") {
    def g(x: Double) = Dtoa.formatString(x, 0, ',')
    assert(g(1.2) == "1,2")
    assert(g(-8.0) == "-8")
    assert(g(math.Pi) == "3,14159265358979")
    assert(g(67.99) == "67,99")
    assert(g(1.5e-5) == "1,5e-05") // mantissa sep only; exponent untouched
  }

  test("fwrite dec=',' sep=';' writes comma decimals (1733.2 end-to-end)") {
    val dir = TestTmp.path("graft_fwrite_dec")
    val df = Seq((1.2, 1), (-8.0, 2), (math.Pi, 3), (67.99, 4)).toDF("V1", "V2")
    Fread.fwrite(df, dir, Fread.FwriteOptions(sep = ";", dec = ","))
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(Seq("1,2;1", "-8;2", "3,14159265358979;3", "67,99;4")
      .forall(lines.contains), lines.mkString("|"))
  }

  test("dec==sep allowed for single-column tables only (#7227, 2337)") {
    val one = Seq(1.0).toDF("V1")
    Fread.fwrite(one, TestTmp.path("graft_fwrite_dec1"), Fread.FwriteOptions(dec = ","))
    val two = Seq((0.1, 0.2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Fread.fwrite(two, TestTmp.path("graft_fwrite_dec2"), Fread.FwriteOptions(dec = ","))
    }
    assert(e.getMessage.contains("dec and sep must be distinct"))
  }

  test("dec=',' reaches sub-second ISO timestamps (#6446, 2281.1/.2)") {
    val dir = TestTmp.path("graft_fwrite_dec_ts")
    val df = Seq(
      (1L, new java.sql.Timestamp(1L)),       // 0.001 s
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, 100000))), // 0.0001 s
      (3L, new java.sql.Timestamp(0L)))       // whole second
      .toDF("id", "a")
    Fread.fwrite(df, dir, Fread.FwriteOptions(sep = ";", dec = ","))
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.contains("1;1970-01-01T00:00:00,001Z"), lines.mkString("|"))
    assert(lines.contains("2;1970-01-01T00:00:00,000100Z"), lines.mkString("|"))
    assert(lines.contains("3;1970-01-01T00:00:00Z"), lines.mkString("|"))
  }

  // ---- fread dec='auto' (R/fread.R:38; tests.Rraw 2256) ----------------

  test("fread auto-detects dec=',' from the sampled balance (2256.06)") {
    val dir = TestTmp.path("graft_fread_dec_auto")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/f.csv"),
      "a;b\n1,14;5\n2,5;6\n".getBytes("UTF-8"))
    val df = Fread.fread(spark, s"$dir/f.csv")
    assert(df.schema("a").dataType.typeName == "double", df.schema)
    assert(df.schema("b").dataType.typeName == "integer", df.schema)
    assert(df.orderBy($"b").as[(Double, Int)].collect().toSeq ==
      Seq((1.14, 5), (2.5, 6)))
  }

  test("fwrite(dec=',') -> fread roundtrip without explicit dec (2256.01)") {
    val dir = TestTmp.path("graft_fread_dec_rt")
    // one part: the dec sniff head-reads the first file of a directory
    val src = Seq((1.5, "x"), (-0.25, "y"), (3.0, "z")).toDF("v", "s").coalesce(1)
    Fread.fwrite(src, dir, Fread.FwriteOptions(sep = ";", dec = ","))
    val back = Fread.fread(spark, dir)
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.orderBy($"s").as[(Double, String)].collect().toSeq ==
      Seq((1.5, "x"), (-0.25, "y"), (3.0, "z")))
  }

  test("dec auto never fires on comma-sep or dot-decimal files") {
    val dir = TestTmp.path("graft_fread_dec_neg")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // comma IS the sep: '1,14' is two fields, dec stays '.'
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g.csv"),
      "a,b\n1,14\n2,15\n".getBytes("UTF-8"))
    val g = Fread.fread(spark, s"$dir/g.csv")
    assert(g.columns.toSeq == Seq("a", "b") && g.count() == 2)
    assert(g.schema("a").dataType.typeName == "integer")
    // dot decimals with a stray comma STRING field: balance stays <= 0
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/h.csv"),
      "a;b;c\n1.5;x,y;2.5\n0.25;p,q;7.5\n".getBytes("UTF-8"))
    val h = Fread.fread(spark, s"$dir/h.csv")
    assert(h.schema("a").dataType.typeName == "double")
    assert(h.schema("b").dataType.typeName == "string")
  }

  // ---- fread strip.white (R/fread.R:41; tests.Rraw 1331-1333) ----------

  test("strip.white=TRUE default strips unquoted fields (1331.1/.2)") {
    val dir = TestTmp.path("graft_fread_sw")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      "A,B\nfoo,1\nAnalyst\\ ,2\nbar,3\n".getBytes("UTF-8"))
    // default escape is '"' so the backslash is ordinary data here
    val on = Fread.fread(spark, s"$dir/a.csv")
    assert(on.orderBy($"B").select($"A").as[String].collect().toSeq ==
      Seq("foo", "Analyst\\", "bar"))
    val off = Fread.fread(spark, s"$dir/a.csv",
      Fread.FreadOptions(stripWhite = false))
    assert(off.orderBy($"B").select($"A").as[String].collect().toSeq ==
      Seq("foo", "Analyst\\ ", "bar"))
  }

  test("strip.white=FALSE keeps leading spaces too (1332.2)") {
    val dir = TestTmp.path("graft_fread_sw2")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.csv"),
      "ab,x\n  cd,x \n".getBytes("UTF-8"))
    val off = Fread.fread(spark, s"$dir/b.csv",
      Fread.FreadOptions(sep = ",", header = "false", stripWhite = false))
    assert(off.orderBy($"V1").as[(String, String)].collect().toSeq ==
      Seq(("  cd", "x "), ("ab", "x")))
    val on = Fread.fread(spark, s"$dir/b.csv",
      Fread.FreadOptions(sep = ",", header = "false"))
    assert(on.orderBy($"V1").as[(String, String)].collect().toSeq ==
      Seq(("ab", "x"), ("cd", "x")))
  }

  test("strip.white applies only OUTSIDE quotes (1333.2 shape)") {
    val dir = TestTmp.path("graft_fread_sw3")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.csv"),
      "A,B\n\" x \",1\n".getBytes("UTF-8"))
    val df = Fread.fread(spark, s"$dir/c.csv")
    assert(df.select($"A").as[String].head() == " x ",
      df.select($"A").as[String].head())
  }

  test("fwrite formats double ARRAY elements the same way (1658.45 list shape)") {
    val dir = TestTmp.path("graft_fwrite_float_arr")
    val df = Seq((2L, Seq(3.14, 1e12))).toDF("a", "b")
    Fread.fwrite(df, dir, Fread.FwriteOptions())
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.contains("2,3.14|1e+12"), lines.mkString("|"))
  }
}
