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
    val dir = "/tmp/graft_fwrite_float"
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

  test("fwrite formats double ARRAY elements the same way (1658.45 list shape)") {
    val dir = "/tmp/graft_fwrite_float_arr"
    val df = Seq((2L, Seq(3.14, 1e12))).toDF("a", "b")
    Fread.fwrite(df, dir, Fread.FwriteOptions())
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.contains("2,3.14|1e+12"), lines.mkString("|"))
  }
}
