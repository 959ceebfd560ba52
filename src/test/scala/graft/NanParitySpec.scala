package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Funcs
import graft.operators.Windows

/** Round-10b: the reference's NaN-is-missing defaults, ported from its
  * dedicated suites `inst/tests/nafill.Rraw` (tests 1.01-1.22) and
  * `inst/tests/froll.Rraw` (6000.064-067, 6000.13xx): `nafill` and
  * `froll(na.rm=TRUE)` treat NaN as NA (src/nafill.c nan_is_na,
  * src/froll.c ISNAN), while Inf/-Inf are ordinary values that carry
  * and aggregate. SQL has no NA/NaN split, so these are the cases most
  * likely to silently drift.
  */
class NanParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NaN = Double.NaN
  private val Inf = Double.PositiveInfinity

  private def seqDF(vs: Seq[Option[Double]]) =
    vs.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("k", "v")

  private def collectD(df: org.apache.spark.sql.DataFrame,
                       c: String): Seq[Option[Double]] =
    df.orderBy("k").select(col(c)).as[Option[Double]].collect().toSeq

  private def same(got: Seq[Option[Double]], want: Seq[Option[Double]]): Boolean =
    got.size == want.size && got.zip(want).forall {
      case (Some(a), Some(b)) => (a.isNaN && b.isNaN) || a == b
      case (a, b)             => a == b
    }

  // nafill.Rraw x = 1:10 with NA at 1:2, 5:6, 9:10 (ints, here doubles /2)
  private val y: Seq[Option[Double]] =
    Seq(None, None, Some(1.5), Some(2.0), None, None, Some(3.5), Some(4.0),
      None, None)
  // nafill.Rraw z: y with z[2]=Inf, z[5]=NaN, z[9]=-Inf
  private val z: Seq[Option[Double]] =
    Seq(None, Some(Inf), Some(1.5), Some(2.0), Some(NaN), None, Some(3.5),
      Some(4.0), Some(-Inf), None)

  test("nafill const: fills NA; fill=Inf and fill=NaN are values (1.13-1.19)") {
    val d = seqDF(y)
    assert(same(collectD(d.withColumn("f", Funcs.nafill($"v", lit(0.0))), "f"),
      Seq(Some(0.0), Some(0.0), Some(1.5), Some(2.0), Some(0.0), Some(0.0),
        Some(3.5), Some(4.0), Some(0.0), Some(0.0))))
    assert(same(collectD(d.withColumn("f", Funcs.nafill($"v", lit(Inf))), "f"),
      Seq(Some(Inf), Some(Inf), Some(1.5), Some(2.0), Some(Inf), Some(Inf),
        Some(3.5), Some(4.0), Some(Inf), Some(Inf))))
    assert(same(collectD(d.withColumn("f", Funcs.nafill($"v", lit(NaN))), "f"),
      Seq(Some(NaN), Some(NaN), Some(1.5), Some(2.0), Some(NaN), Some(NaN),
        Some(3.5), Some(4.0), Some(NaN), Some(NaN))))
    // NaN VALUE is missing under the default, so it gets filled too
    assert(same(collectD(seqDF(z)
        .withColumn("f", Funcs.nafill($"v", lit(0.0))), "f"),
      Seq(Some(0.0), Some(Inf), Some(1.5), Some(2.0), Some(0.0), Some(0.0),
        Some(3.5), Some(4.0), Some(-Inf), Some(0.0))))
  }

  test("nafill locf/nocb: NaN is missing by default, Inf carries (1.21-1.22)") {
    val d = seqDF(z)
    val locf = d.withColumn("f",
      Windows.nafillLocf($"v", Nil, Seq($"k".asc), allowGlobal = true))
    assert(same(collectD(locf, "f"),
      Seq(None, Some(Inf), Some(1.5), Some(2.0), Some(2.0), Some(2.0),
        Some(3.5), Some(4.0), Some(-Inf), Some(-Inf))))
    val nocb = d.withColumn("f",
      Windows.nafillNocb($"v", Nil, Seq($"k".asc), allowGlobal = true))
    assert(same(collectD(nocb, "f"),
      Seq(Some(Inf), Some(Inf), Some(1.5), Some(2.0), Some(3.5), Some(3.5),
        Some(3.5), Some(4.0), Some(-Inf), None)))
  }

  test("nafill nanIsNa=false is the reference's nan=NaN opt-out: NaN is a value") {
    val d = seqDF(z)
    val locf = d.withColumn("f",
      Windows.nafillLocf($"v", Nil, Seq($"k".asc), allowGlobal = true,
        nanIsNa = false))
    // NaN stays AND carries into the following NA slot
    assert(same(collectD(locf, "f"),
      Seq(None, Some(Inf), Some(1.5), Some(2.0), Some(NaN), Some(NaN),
        Some(3.5), Some(4.0), Some(-Inf), Some(-Inf))))
    val const = d.withColumn("f", Funcs.nafill($"v", lit(0.0), nanIsNa = false))
    assert(same(collectD(const, "f"),
      Seq(Some(0.0), Some(Inf), Some(1.5), Some(2.0), Some(NaN), Some(0.0),
        Some(3.5), Some(4.0), Some(-Inf), Some(0.0))))
  }

  test("nafill stays usable on int and date columns (nafill.Rraw 1.01-1.04, 1.44)") {
    val ints = Seq(Some(1), Some(2), None, Some(4), None)
      .zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("k", "v")
    val gotI = ints
      .withColumn("c", Funcs.nafill($"v", lit(0)))
      .withColumn("l", Windows.nafillLocf($"v", Nil, Seq($"k".asc), allowGlobal = true))
      .orderBy("k").select($"c", $"l").as[(Int, Option[Int])].collect().toSeq
    assert(gotI == Seq((1, Some(1)), (2, Some(2)), (0, Some(2)), (4, Some(4)),
      (0, Some(4))))
    // date column: NanToNull is the identity, no analysis error (#3617)
    val dates = Seq(Some("2020-01-01"), None, Some("2020-01-03"))
      .zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("k", "v")
      .withColumn("v", to_date($"v"))
    val gotD = dates
      .withColumn("l", Windows.nafillLocf($"v", Nil, Seq($"k".asc), allowGlobal = true))
      .orderBy("k").select($"l".cast("string")).as[Option[String]].collect().toSeq
    assert(gotD == Seq(Some("2020-01-01"), Some("2020-01-01"), Some("2020-01-03")))
  }

  // froll.Rraw 6000.064-067: d = (V1, V2), frollmean n=2:3
  private val v1: Seq[Option[Double]] =
    Seq(Some(0.5), None, Some(1.5), Some(2.0), None, Some(3.0))
  private val v2: Seq[Option[Double]] =
    Seq(Some(0.75), Some(1.0), Some(1.25), None, None, None)

  test("frollmean na.rm=FALSE: any-NA window is NA (froll.Rraw 6000.064)") {
    val d1 = Windows.frollN(seqDF(v1), "m", "mean", $"v", Seq(2, 3),
      Nil, Seq($"k".asc), allowGlobal = true)
    assert(same(collectD(d1, "m2"),
      Seq(None, None, None, Some(1.75), None, None)))
    assert(same(collectD(d1, "m3"), Seq.fill(6)(None)))
    val d2 = Windows.frollN(seqDF(v2), "m", "mean", $"v", Seq(2, 3),
      Nil, Seq($"k".asc), allowGlobal = true)
    assert(same(collectD(d2, "m2"),
      Seq(None, Some(0.875), Some(1.125), None, None, None)))
    assert(same(collectD(d2, "m3"),
      Seq(None, None, Some(1.0), None, None, None)))
  }

  test("frollmean na.rm=TRUE: NA skipped, all-NA window is NaN (6000.066)") {
    val d1 = Windows.frollN(seqDF(v1), "m", "mean", $"v", Seq(2, 3),
      Nil, Seq($"k".asc), allowGlobal = true, naRm = true)
    assert(same(collectD(d1, "m2"),
      Seq(None, Some(0.5), Some(1.5), Some(1.75), Some(2.0), Some(3.0))))
    assert(same(collectD(d1, "m3"),
      Seq(None, None, Some(1.0), Some(1.75), Some(1.75), Some(2.5))))
    val d2 = Windows.frollN(seqDF(v2), "m", "mean", $"v", Seq(2, 3),
      Nil, Seq($"k".asc), allowGlobal = true, naRm = true)
    assert(same(collectD(d2, "m2"),
      Seq(None, Some(0.875), Some(1.125), Some(1.25), Some(NaN), Some(NaN))))
    assert(same(collectD(d2, "m3"),
      Seq(None, None, Some(1.0), Some(1.125), Some(1.25), Some(NaN))))
  }

  test("froll na.rm=TRUE empty-window conventions: sum 0, prod 1, min/max NaN") {
    val allNa: Seq[Option[Double]] = Seq(Some(1.0), None, None, Some(4.0))
    val d = seqDF(allNa)
    def roll(fn: String) = collectD(d.withColumn("r",
      Windows.froll(fn, $"v", 2, Nil, Seq($"k".asc), allowGlobal = true,
        naRm = true)), "r")
    // window at k=3 is (None, None) → the R empty-reduction value
    assert(same(roll("sum"), Seq(None, Some(1.0), Some(0.0), Some(4.0))))
    assert(same(roll("prod"), Seq(None, Some(1.0), Some(1.0), Some(4.0))))
    assert(same(roll("mean"), Seq(None, Some(1.0), Some(NaN), Some(4.0))))
    assert(same(roll("min"), Seq(None, Some(1.0), Some(NaN), Some(4.0))))
    assert(same(roll("max"), Seq(None, Some(1.0), Some(NaN), Some(4.0))))
    assert(same(roll("median"), Seq(None, Some(1.0), Some(NaN), Some(4.0))))
  }

  test("froll na.rm=TRUE removes NaN like NA (src/froll.c ISNAN)") {
    val withNan: Seq[Option[Double]] = Seq(Some(1.0), Some(NaN), Some(3.0))
    val d = seqDF(withNan)
    val got = collectD(d.withColumn("r",
      Windows.froll("mean", $"v", 2, Nil, Seq($"k".asc), allowGlobal = true,
        naRm = true)), "r")
    assert(same(got, Seq(None, Some(1.0), Some(3.0))))
  }

  test("froll na.rm=FALSE propagates NaN through min/max/median (wmax parity)") {
    val withNan: Seq[Option[Double]] = Seq(Some(1.0), Some(NaN), Some(3.0), Some(4.0))
    val d = seqDF(withNan)
    def roll(fn: String) = collectD(d.withColumn("r",
      Windows.froll(fn, $"v", 2, Nil, Seq($"k".asc), allowGlobal = true)), "r")
    // Spark's ordering would otherwise SKIP NaN in min / ADOPT it in max
    assert(same(roll("min"), Seq(None, Some(NaN), Some(NaN), Some(3.0))))
    assert(same(roll("max"), Seq(None, Some(NaN), Some(NaN), Some(4.0))))
    assert(same(roll("median"), Seq(None, Some(NaN), Some(NaN), Some(3.5))))
    assert(same(roll("mean"), Seq(None, Some(NaN), Some(NaN), Some(3.5))))
  }

  test("frollsum non-finite windows follow IEEE arithmetic (6000.1313 analog)") {
    // reference pins c(NA, NaN, -Inf, NA, Inf) but its own comment marks
    // the NaN-vs-NA choice platform-specific (#3353, R bugzilla 17441);
    // IEEE gives NaN for Inf + -Inf deterministically — documented
    // divergence locked here
    val xs: Seq[Option[Double]] =
      Seq(Some(Inf), Some(-Inf), Some(-Inf), Some(Inf), Some(Inf))
    val got = collectD(seqDF(xs).withColumn("r",
      Windows.froll("sum", $"v", 2, Nil, Seq($"k".asc), allowGlobal = true)), "r")
    assert(same(got, Seq(None, Some(NaN), Some(-Inf), Some(NaN), Some(Inf))))
  }

  test("frollAdaptive na.rm=TRUE: NA skipped per-window (froll.Rraw 6000.219)") {
    // frollsum(c(1:2,NA,4:10), rep(4,10), adaptive=TRUE, na.rm=TRUE)
    val xs: Seq[Option[Double]] =
      (Seq(Some(1.0), Some(2.0), None) ++ (4 to 10).map(i => Some(i.toDouble)))
    val d = seqDF(xs).withColumn("an", lit(4))
    val got = collectD(d.withColumn("r",
      Windows.frollAdaptive("sum", $"v", $"an", 4, Nil, Seq($"k".asc),
        allowGlobal = true, naRm = true)), "r")
    assert(same(got, Seq(None, None, None, Some(7.0), Some(11.0), Some(15.0),
      Some(22.0), Some(26.0), Some(30.0), Some(34.0))))
    // NaN is dropped like NA; all-missing window → NaN for max
    val ys: Seq[Option[Double]] = Seq(Some(1.0), Some(NaN), Some(3.0), None, None)
    val d2 = seqDF(ys).withColumn("an", lit(2))
    val gotM = collectD(d2.withColumn("r",
      Windows.frollAdaptive("max", $"v", $"an", 3, Nil, Seq($"k".asc),
        allowGlobal = true, naRm = true)), "r")
    assert(same(gotM, Seq(None, Some(1.0), Some(3.0), Some(3.0), Some(NaN))))
  }

  test("frollFast na.rm=TRUE: O(1)-per-row prefix tier matches the exact tier") {
    // same vectors as the fixed-window battery; NaN stripped pre-prefix
    val xs: Seq[Option[Double]] =
      Seq(Some(1.0), None, Some(NaN), Some(4.0), None, None, Some(7.0))
    val d = seqDF(xs)
    val fast = collectD(Windows.frollFast(d, "r", "mean", $"v", 3,
      Nil, Seq($"k".asc), allowGlobal = true, naRm = true), "r")
    val exact = collectD(d.withColumn("r",
      Windows.froll("mean", $"v", 3, Nil, Seq($"k".asc),
        allowGlobal = true, naRm = true)), "r")
    assert(same(fast, exact), s"fast=$fast exact=$exact")
    val fastSum = collectD(Windows.frollFast(d, "r", "sum", $"v", 3,
      Nil, Seq($"k".asc), allowGlobal = true, naRm = true), "r")
    val exactSum = collectD(d.withColumn("r",
      Windows.froll("sum", $"v", 3, Nil, Seq($"k".asc),
        allowGlobal = true, naRm = true)), "r")
    assert(same(fastSum, exactSum), s"fast=$fastSum exact=$exactSum")
  }

  test("GlobalOrdered nafill treats NaN as missing across bucket boundaries") {
    import graft.operators.GlobalOrdered
    val d = seqDF(z).withColumn("k", $"k".cast("long"))
    val locf = GlobalOrdered.nafillLocf(d, $"v", $"k", "f", buckets = 3)
    assert(same(collectD(locf, "f"),
      Seq(None, Some(Inf), Some(1.5), Some(2.0), Some(2.0), Some(2.0),
        Some(3.5), Some(4.0), Some(-Inf), Some(-Inf))))
    val nocb = GlobalOrdered.nafillNocb(d, $"v", $"k", "f", buckets = 3)
    assert(same(collectD(nocb, "f"),
      Seq(Some(Inf), Some(Inf), Some(1.5), Some(2.0), Some(3.5), Some(3.5),
        Some(3.5), Some(4.0), Some(-Inf), None)))
  }
}
