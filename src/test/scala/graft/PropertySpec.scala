package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

/** Property-based equivalence: the distributed kernels against tiny
  * driver-side reference models on RANDOM inputs (seeded by scalacheck;
  * failures shrink to a minimal counterexample). Each property runs the
  * full Catalyst plan per sample, so sizes stay small — the value is
  * the input-space coverage, not volume.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // plain scalacheck runner (no scalatestplus bridge in the offline
  // dep set): 25 samples per property, fixed seed for reproducibility
  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // optional doubles incl. nulls, short vectors
  private val optDoubleGen: Gen[Option[Double]] =
    Gen.frequency(4 -> Gen.choose(-100.0, 100.0).map(Some(_)),
                  1 -> Gen.const(None))
  private val seriesGen: Gen[List[Option[Double]]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, optDoubleGen))

  test("froll sum == sliding reference model (na.rm=FALSE, partial both ways)") {
    import spark.implicits._
    check(forAll(seriesGen, Gen.choose(1, 5), Gen.oneOf(true, false)) {
      (xs: List[Option[Double]], n: Int, partial: Boolean) =>
        val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("o", "v")
        val got = df.withColumn("r",
            Windows.froll("sum", $"v", n, Nil, Seq($"o".asc),
              partial = partial, allowGlobal = true))
          .orderBy($"o").select($"r").as[Option[Double]].collect().toSeq
        val want = xs.indices.map { i =>
          val lo = math.max(0, i - n + 1)
          val win = xs.slice(lo, i + 1)
          val full = win.size == n
          if (win.exists(_.isEmpty) || (!partial && !full)) None
          else Some(win.flatten.sum)
        }
        val ok = got.zip(want).forall {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (None, None) => true
          case _ => false
        }
        Prop(ok) :| s"xs=$xs n=$n partial=$partial got=$got want=$want"
    })
  }

  test("rleid == scan reference model incl. NA runs") {
    import spark.implicits._
    val valGen: Gen[Option[String]] =
      Gen.frequency(3 -> Gen.oneOf("a", "b").map(Some(_)), 1 -> Gen.const(None))
    check(forAll(Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, valGen))) {
      (xs: List[Option[String]]) =>
        val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("o", "v")
        val got = Windows.rleid(df, Seq("v"), Seq($"o".asc), Nil, "rid",
            allowGlobal = true)
          .orderBy($"o").select($"rid").as[Long].collect().toSeq
        var run = 0L
        var prev: Option[Option[String]] = None
        val want = xs.map { cur =>
          if (!prev.contains(cur)) run += 1   // NA==NA continues a run
          prev = Some(cur)
          run
        }
        Prop(got == want) :| s"xs=$xs got=$got want=$want"
    })
  }

  test("shift(n) == drop/pad reference model, both directions") {
    import spark.implicits._
    check(forAll(seriesGen, Gen.choose(-3, 3)) {
      (xs: List[Option[Double]], n: Int) =>
        val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("o", "v")
        val got = df.withColumn("s",
            Windows.shift($"v", n, Nil, Seq($"o".asc), allowGlobal = true))
          .orderBy($"o").select($"s").as[Option[Double]].collect().toSeq
        val want = xs.indices.map { i =>
          val j = i - n
          if (j < 0 || j >= xs.size) None else xs(j)
        }
        Prop(got == want) :| s"xs=$xs n=$n got=$got want=$want"
    })
  }
}

/** As-of join vs a driver-side scan model on random (group, time, value)
  * tables — LOCF, NOCB and Nearest, distinct on-values per side+group
  * (tie-break order is pinned by its own Round8Spec battery).
  */
class AsofPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.Joins

  // one group, distinct int times each side, small tables
  private val sideGen: Gen[List[(Int, Double)]] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.pick(n, 0 to 20).flatMap(ts =>
        Gen.listOfN(n, Gen.choose(-50.0, 50.0)).map(vs => ts.toList.zip(vs))))

  test("asof LOCF/NOCB/Nearest == scan model") {
    import spark.implicits._
    check(forAll(sideGen, sideGen, Gen.oneOf("locf", "nocb", "nearest")) {
      (xs: List[(Int, Double)], is: List[(Int, Double)], mode: String) =>
        val x = xs.map { case (t, v) => ("g", t, v) }.toDF("g", "t", "xv")
        val i = is.zipWithIndex.map { case ((t, _), k) => (k.toLong, "g", t) }
          .toDF("id", "g", "t")
        val roll = mode match {
          case "locf" => Joins.Locf
          case "nocb" => Joins.Nocb
          case _      => Joins.Nearest
        }
        val got = Joins.asof(x, i, Seq("g"), "t", roll, Seq("xv"))
          .orderBy($"id").select($"xv").as[Option[Double]].collect().toSeq
        val want = is.map { case (t, _) =>
          val before = xs.filter(_._1 <= t)
          val after = xs.filter(_._1 >= t)
          mode match {
            case "locf" => before.sortBy(_._1).lastOption.map(_._2)
            case "nocb" => after.sortBy(_._1).headOption.map(_._2)
            case _ =>
              // nearest: min |dt|; tie -> the EARLIER (LOCF) side
              if (xs.isEmpty) None
              else Some(xs.minBy(p => (math.abs(p._1 - t), p._1 > t))._2)
          }
        }
        val ok = got.size == want.size && got.zip(want).forall {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (None, None) => true
          case _ => false
        }
        Prop(ok) :| s"mode=$mode xs=$xs is=$is got=$got want=$want"
    })
  }
}

/** foverlaps(type=any/within) vs the quadratic model; melt→dcast
  * round-trip identity on random wide tables.
  */
class OverlapReshapePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.{Joins, Reshape}

  // negative starts included: the binned path's floor-division bin ids
  // must stay correct left of zero
  private val ivGen: Gen[List[(Int, Int)]] =
    Gen.choose(0, 5).flatMap(n => Gen.listOfN(n,
      for { s <- Gen.choose(-12, 15); len <- Gen.choose(0, 5) } yield (s, s + len)))

  test("overlap any/within == quadratic model (auto-binned path)") {
    import spark.implicits._
    check(forAll(ivGen, ivGen, Gen.oneOf("any", "within", "start", "end", "equal")) {
      (xs: List[(Int, Int)], ys: List[(Int, Int)], typ: String) =>
        val x = xs.zipWithIndex.map { case ((s, e), k) => (k.toLong, s, e) }
          .toDF("xid", "xs", "xe")
        val y = ys.zipWithIndex.map { case ((s, e), k) => (k.toLong, s, e) }
          .toDF("yid", "ys", "ye")
        val got = Joins.overlap(x, y, Nil, "xs", "xe", "ys", "ye", typ)
          .select($"xid", $"yid").as[(Long, Long)].collect().toSet
        val want = (for {
          (xi, xk) <- xs.zipWithIndex
          (yi, yk) <- ys.zipWithIndex
          hit = typ match {
            case "any"    => xi._1 <= yi._2 && yi._1 <= xi._2
            case "within" => xi._1 >= yi._1 && xi._2 <= yi._2
            case "start"  => xi._1 == yi._1
            case "end"    => xi._2 == yi._2
            case "equal"  => xi._1 == yi._1 && xi._2 == yi._2
          }
          if hit
        } yield (xk.toLong, yk.toLong)).toSet
        Prop(got == want) :| s"typ=$typ xs=$xs ys=$ys got=$got want=$want"
    })
  }

  test("melt then dcast(first) reconstructs the wide table") {
    import spark.implicits._
    val rowGen = for {
      a <- Gen.choose(-9.0, 9.0); b <- Gen.choose(-9.0, 9.0)
      c <- Gen.choose(-9.0, 9.0)
    } yield (a, b, c)
    check(forAll(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, rowGen))) {
      (rows: List[(Double, Double, Double)]) =>
        val wide = rows.zipWithIndex.map { case ((a, b, c), i) => (i, a, b, c) }
          .toDF("id", "a", "b", "c")
        val long = Reshape.melt(wide, Seq("id"), Seq("a", "b", "c"))
        val back = Reshape.dcast(long, Seq("id"), "variable", "value",
            first(_), values = Seq("a", "b", "c"))
          .orderBy($"id")
        val got = back.select($"id", $"a", $"b", $"c")
          .as[(Int, Double, Double, Double)].collect().toSeq
        val want = rows.zipWithIndex.map { case ((a, b, c), i) => (i, a, b, c) }
        Prop(got == want) :| s"rows=$rows got=$got"
    })
  }
}

/** frank ties enum vs a driver-side rank model on random values with
  * heavy tie probability.
  */
class FrankPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(13L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.Windows

  test("min/max/dense/first/average agree with the model") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // values from a tiny domain -> many ties
    val xsGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 3)))
    check(forAll(xsGen, Gen.oneOf("min", "max", "dense", "first", "average")) {
      (xs: List[Int], ties: String) =>
        val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("o", "v")
        val got = Windows.frank(df, Seq(col("v").asc), Seq(col("v")), ties,
            Nil, "rk", appearance = Seq(col("o").asc), allowGlobal = true)
          .orderBy(col("o")).select(col("rk").cast("double"))
          .as[Double].collect().toSeq
        val sortedIdx = xs.zipWithIndex.sortBy { case (v, i) => (v, i) }
        val pos = sortedIdx.zipWithIndex.map { case ((_, i), p) => i -> (p + 1) }.toMap
        val want = xs.zipWithIndex.map { case (v, i) =>
          val tiedPos = xs.zipWithIndex.filter(_._1 == v).map(p => pos(p._2))
          ties match {
            case "min"     => tiedPos.min.toDouble
            case "max"     => tiedPos.max.toDouble
            case "dense"   => xs.distinct.sorted.indexOf(v) + 1.0
            case "first"   => pos(i).toDouble
            case "average" => tiedPos.sum.toDouble / tiedPos.size
          }
        }
        Prop(got == want) :| s"ties=$ties xs=$xs got=$got want=$want"
    })
  }
}

/** Set-op multiset (all=TRUE) semantics vs count-based models. */
class SetOpsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(17L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.SetOps

  private val bagGen: Gen[List[Int]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.choose(0, 3)))

  test("fintersect/fsetdiff all=TRUE follow min/subtract multiplicity") {
    import spark.implicits._
    check(forAll(bagGen, bagGen) { (xs: List[Int], ys: List[Int]) =>
      val x = xs.toDF("v"); val y = ys.toDF("v")
      def counts(s: Seq[Int]) = s.groupBy(identity).view.mapValues(_.size).toMap
      val cx = counts(xs); val cy = counts(ys)
      val gotI = counts(SetOps.fintersect(x, y, all = true).as[Int].collect().toSeq)
      val wantI = cx.flatMap { case (v, n) =>
        val m = math.min(n, cy.getOrElse(v, 0)); if (m > 0) Some(v -> m) else None }
      val gotD = counts(SetOps.fsetdiff(x, y, all = true).as[Int].collect().toSeq)
      val wantD = cx.flatMap { case (v, n) =>
        val m = n - cy.getOrElse(v, 0); if (m > 0) Some(v -> m) else None }
      val gotU = counts(SetOps.funion(x, y, all = true).as[Int].collect().toSeq)
      val wantU = (cx.keySet ++ cy.keySet).flatMap { v =>
        val m = cx.getOrElse(v, 0) + cy.getOrElse(v, 0)
        if (m > 0) Some(v -> m) else None }.toMap
      Prop(gotI == wantI && gotD == wantD && gotU == wantU) :|
        s"xs=$xs ys=$ys I:$gotI/$wantI D:$gotD/$wantD U:$gotU/$wantU"
    })
  }
}

/** nafill locf/nocb/const vs scan models on random null-heavy series. */
class NafillPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(19L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.Windows

  private val xsGen: Gen[List[Option[Double]]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.frequency(1 -> Gen.choose(-9.0, 9.0).map(Some(_)),
                    1 -> Gen.const(None))))

  test("locf == carry-forward scan; nocb == reversed locf; const == getOrElse") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    check(forAll(xsGen) { (xs: List[Option[Double]]) =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("o", "v")
      val locf = df.withColumn("f",
          Windows.nafillLocf(col("v"), Nil, Seq(col("o").asc), allowGlobal = true))
        .orderBy(col("o")).select(col("f")).as[Option[Double]].collect().toSeq
      val wantL = xs.scanLeft(None: Option[Double])((acc, v) => v.orElse(acc)).tail
      val nocb = df.withColumn("f",
          Windows.nafillNocb(col("v"), Nil, Seq(col("o").asc), allowGlobal = true))
        .orderBy(col("o")).select(col("f")).as[Option[Double]].collect().toSeq
      val wantN = xs.reverse.scanLeft(None: Option[Double])((acc, v) => v.orElse(acc))
        .tail.reverse
      val const = df.withColumn("f",
          graft.functions.Funcs.nafill(col("v"), lit(0.5)))
        .orderBy(col("o")).select(col("f")).as[Double].collect().toSeq
      val wantC = xs.map(_.getOrElse(0.5))
      Prop(locf == wantL && nocb == wantN && const == wantC) :|
        s"xs=$xs locf=$locf/$wantL nocb=$nocb/$wantN const=$const/$wantC"
    })
  }
}

/** dcast(sum, fill=) vs a group-model on random long tables with
  * missing (lhs, rhs) combinations.
  */
class DcastPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(23L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.Reshape

  private val rowsGen: Gen[List[(Int, String, Double)]] =
    Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.choose(0, 3)
      p  <- Gen.oneOf("x", "y", "z")
      v  <- Gen.choose(-9.0, 9.0)
    } yield (id, p, v)))

  test("dcast sum + fill=0 == grouped-sum model over all pivot levels") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum, lit}
    check(forAll(rowsGen) { (rows: List[(Int, String, Double)]) =>
      val df = rows.toDF("id", "p", "v")
      val wide = Reshape.dcast(df, Seq("id"), "p", "v", sum(_),
          values = Seq("x", "y", "z"), fill = Some(lit(0.0)))
        .orderBy(col("id"))
      val got = wide.select(col("id"), col("x"), col("y"), col("z"))
        .as[(Int, Double, Double, Double)].collect().toSeq
      val ids = rows.map(_._1).distinct.sorted
      val want = ids.map { id =>
        def s(p: String) = {
          val vs = rows.filter(r => r._1 == id && r._2 == p).map(_._3)
          vs.sum   // empty -> 0.0 == the fill
        }
        (id, s("x"), s("y"), s("z"))
      }
      val ok = got.size == want.size && got.zip(want).forall { case (g, w) =>
        g._1 == w._1 && math.abs(g._2 - w._2) < 1e-9 &&
          math.abs(g._3 - w._3) < 1e-9 && math.abs(g._4 - w._4) < 1e-9
      }
      Prop(ok) :| s"rows=$rows got=$got want=$want"
    })
  }

  // ---- joins vs a driver-side nested-loop model (round-9 item 7):
  // random inputs INCLUDING null keys and duplicate on-values — the
  // suite that makes the NA-join default question mechanical.

  private val joinKeyGen: Gen[Option[Int]] =
    Gen.frequency(3 -> Gen.choose(0, 3).map(Some(_)), 1 -> Gen.const(None))
  private val joinSideGen: Gen[List[Option[Int]]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, joinKeyGen))

  test("equi join == nested-loop model: NA-match default AND SQL opt-out, inner/left, dup keys") {
    import spark.implicits._
    check(forAll(joinSideGen, joinSideGen, Gen.oneOf("inner", "left"),
        Gen.oneOf(true, false)) {
      (xs: List[Option[Int]], is: List[Option[Int]], how: String, ns: Boolean) =>
        val x = xs.zipWithIndex.map { case (k, i) => (i, k) }.toDF("xid", "k")
        val i = is.zipWithIndex.map { case (k, j) => (j, k) }.toDF("iid", "k")
        val got = DT(x).join(DT(i), Seq("k"), how, nullSafe = ns).df
          .select($"xid", $"iid").as[(Int, Option[Int])].collect().toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        def m(a: Option[Int], b: Option[Int]): Boolean =
          if (ns) a == b else a.nonEmpty && a == b
        val inner = for {
          (xk, xi) <- xs.zipWithIndex; (ik, ij) <- is.zipWithIndex if m(xk, ik)
        } yield (xi, Some(ij): Option[Int])
        val want = (how match {
          case "inner" => inner
          case "left" => xs.zipWithIndex.flatMap { case (xk, xi) =>
            val ms = inner.filter(_._1 == xi)
            if (ms.nonEmpty) ms else Seq((xi, None: Option[Int]))
          }
        }).groupBy(identity).view.mapValues(_.size).toMap
        Prop(got == want) :| s"xs=$xs is=$is how=$how ns=$ns got=$got want=$want"
    })
  }

  test("default equi join keeps the NA-matched key value (reference parity)") {
    import spark.implicits._
    check(forAll(joinSideGen, joinSideGen) {
      (xs: List[Option[Int]], is: List[Option[Int]]) =>
        val x = xs.zipWithIndex.map { case (k, i) => (i, k) }.toDF("xid", "k")
        val i = is.zipWithIndex.map { case (k, j) => (j, k) }.toDF("iid", "k")
        val got = DT(x).join(DT(i), Seq("k"), "inner").df
          .select($"xid", $"k").as[(Int, Option[Int])].collect().toSeq
        // every output row's key equals ITS x row's key (null included)
        Prop(got.forall { case (xi, k) => xs(xi) == k }) :|
          s"xs=$xs is=$is got=$got"
    })
  }

  test("non-equi theta join == quadratic filter model (null operands never match)") {
    import spark.implicits._
    check(forAll(joinSideGen, joinSideGen) {
      (xs: List[Option[Int]], is: List[Option[Int]]) =>
        val x = xs.zipWithIndex.map { case (k, i) => (i, k) }.toDF("xid", "xk")
        val i = is.zipWithIndex.map { case (k, j) => (j, k) }.toDF("iid", "ik")
        val got = DT(x).joinExpr(DT(i), col("xk") < col("ik"), "inner").df
          .select($"xid", $"iid").as[(Int, Int)].collect().toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        val want = (for {
          (xk, xi) <- xs.zipWithIndex; (ik, ij) <- is.zipWithIndex
          if xk.nonEmpty && ik.nonEmpty && xk.get < ik.get
        } yield (xi, ij)).groupBy(identity).view.mapValues(_.size).toMap
        Prop(got == want) :| s"xs=$xs is=$is got=$got want=$want"
    })
  }

  // ---- GlobalOrdered tier vs driver-side sequential models (round 10).
  // Unique integer keys (global row outputs need a total order), random
  // null patterns, random bucket counts 1..6 so bucket boundaries land
  // everywhere relative to the data.

  private val optDoubleGen2: Gen[Option[Double]] =
    Gen.frequency(4 -> Gen.choose(-100.0, 100.0).map(Some(_)),
                  1 -> Gen.const(None))
  private val seriesGen2: Gen[List[Option[Double]]] =
    Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, optDoubleGen2))
  // keys derived from position INSIDE the property, so shrunk lists
  // still satisfy the tier's unique-key contract
  private def keyed(vs: List[Option[Double]]): List[(Long, Option[Double])] =
    vs.zipWithIndex.map { case (v, i) => ((i * 7 + 3).toLong, v) }

  test("GlobalOrdered.cumsum == sequential prefix model at any bucket count") {
    import spark.implicits._
    import graft.operators.GlobalOrdered
    check(forAll(seriesGen2, Gen.choose(1, 6), Gen.oneOf(true, false)) {
      (vs: List[Option[Double]], buckets: Int, naRm: Boolean) =>
        val xs = keyed(vs)
        val df = xs.toDF("k", "v")
        val got = GlobalOrdered.cumsum(df, $"v", $"k", "cs",
            naRm = naRm, buckets = buckets)
          .orderBy($"k").select($"cs").as[Option[Double]].collect().toSeq
        val want = xs.indices.map { i =>
          val pfx = xs.take(i + 1).map(_._2)
          val nn = pfx.flatten
          if (naRm) { if (nn.isEmpty) None else Some(nn.sum) }
          else { if (nn.size < pfx.size) None else Some(nn.sum) }
        }
        val ok = got.size == want.size && got.zip(want).forall {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (a, b) => a == b
        }
        Prop(ok) :| s"xs=$xs buckets=$buckets naRm=$naRm got=$got want=$want"
    })
  }

  test("GlobalOrdered.shift == drop/pad model across bucket boundaries") {
    import spark.implicits._
    import graft.operators.GlobalOrdered
    check(forAll(seriesGen2, Gen.choose(-3, 3), Gen.choose(1, 4)) {
      (vs: List[Option[Double]], n: Int, buckets: Int) =>
        val xs = keyed(vs)
        val df = xs.toDF("k", "v")
        val got = GlobalOrdered.shift(df, $"v", n, $"k", "sh",
            buckets = buckets)
          .orderBy($"k").select($"sh").as[Option[Double]].collect().toSeq
        val want = xs.indices.map { i =>
          val j = i - n
          if (j < 0 || j >= xs.size) None else xs(j)._2
        }
        Prop(got == want) :| s"xs=$xs n=$n buckets=$buckets got=$got want=$want"
    })
  }

  test("GlobalOrdered.froll == sliding model across bucket boundaries, all aligns") {
    import spark.implicits._
    import graft.operators.GlobalOrdered
    check(forAll(seriesGen2, Gen.choose(1, 4), Gen.choose(1, 4),
        Gen.oneOf("right", "left", "center")) {
      (vs: List[Option[Double]], n: Int, buckets: Int, align: String) =>
        val xs = keyed(vs)
        val df = xs.toDF("k", "v")
        val got = GlobalOrdered.froll(df, "r", "sum", $"v", n, $"k",
            align = align, buckets = buckets)
          .orderBy($"k").select($"r").as[Option[Double]].collect().toSeq
        val before = align match {
          case "right" => n - 1; case "left" => 0; case _ => (n - 1) / 2
        }
        val want = xs.indices.map { i =>
          val lo = i - before
          val hi = lo + n - 1
          if (lo < 0 || hi >= xs.size) None
          else {
            val w = (lo to hi).map(j => xs(j)._2)
            if (w.exists(_.isEmpty)) None else Some(w.flatten.sum)
          }
        }
        val ok = got.size == want.size && got.zip(want).forall {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case (a, b) => a == b
        }
        Prop(ok) :| s"xs=$xs n=$n buckets=$buckets align=$align got=$got want=$want"
    })
  }

  test("GlobalOrdered.rleid and frank(dense) == sequential models with ties and nulls") {
    import spark.implicits._
    import graft.operators.GlobalOrdered
    // low-cardinality values force runs and ties; nulls included
    val lowCardGen: Gen[List[Option[Int]]] =
      Gen.choose(1, 16).flatMap(n => Gen.listOfN(n,
        Gen.frequency(4 -> Gen.choose(0, 2).map(Some(_)), 1 -> Gen.const(None))))
    check(forAll(lowCardGen, Gen.choose(1, 4)) {
      (vs: List[Option[Int]], buckets: Int) =>
        val xs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val df = xs.toDF("k", "v")
        val gotR = GlobalOrdered.rleid(df, Seq("v"), $"k", "rid",
            buckets = buckets)
          .orderBy($"k").select($"rid").as[Long].collect().toSeq
        val wantR = vs.indices.map { i =>
          1L + vs.take(i + 1).sliding(2).count {
            case List(a, b) => a != b
            case _ => false
          }
        }
        // frank dense asc nulls-last over the value column
        val gotD = GlobalOrdered.frank(df, $"v", desc = false, "dense",
            "true", "rk", buckets = buckets)
          .orderBy($"k").select($"rk").as[Long].collect().toSeq
        val sortedDistinct = vs.flatten.distinct.sorted
        val wantD = vs.map {
          case Some(x) => (sortedDistinct.indexOf(x) + 1).toLong
          case None => (sortedDistinct.size + 1).toLong // null group last
        }
        Prop(gotR == wantR && gotD == wantD) :|
          s"vs=$vs buckets=$buckets rleid=$gotR/$wantR dense=$gotD/$wantD"
    })
  }
}

/** mergelist vs a sequential model of the reference's mergepair rules
  * (R/mergelist.R; cross-checked there against SQLite in other.Rraw):
  * mult=first/last dedups the lookup side — RHS for left, LHS for
  * right, BOTH for inner/full — with our deterministic lexicographic
  * representative; mult='error' refuses dups on exactly those sides.
  */
class MergelistPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.operators.Joins

  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(org.scalacheck.rng.Seed(1042L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val sideGen: Gen[List[(Int, Int)]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(1, 4), Gen.choose(0, 99))))

  private def dedup(rows: List[(Int, Int)], m: String): List[(Int, Int)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      k -> (if (m == "first") vs.map(_._2).min else vs.map(_._2).max)
    }.toList

  private def model(l: List[(Int, Int)], r: List[(Int, Int)],
                    how: String, m: String): Set[(Int, Option[Int], Option[Int])] = {
    val symmetric = how == "inner" || how == "full"
    val (ld, rd) =
      if (m == "all") (l, r)
      else (if (symmetric || how == "right") dedup(l, m) else l,
            if (symmetric || how != "right") dedup(r, m) else r)
    val inner = for { (lk, lv) <- ld; (rk, rv) <- rd if lk == rk }
      yield (lk, Some(lv): Option[Int], Some(rv): Option[Int])
    val lOnly = ld.filterNot(x => rd.exists(_._1 == x._1))
      .map(x => (x._1, Some(x._2): Option[Int], None: Option[Int]))
    val rOnly = rd.filterNot(x => ld.exists(_._1 == x._1))
      .map(x => (x._1, None: Option[Int], Some(x._2): Option[Int]))
    (how match {
      case "inner" => inner
      case "left"  => inner ++ lOnly
      case "right" => inner ++ rOnly
      case "full"  => inner ++ lOnly ++ rOnly
    }).toSet
  }

  test("mergelist == sequential mergepair model over how x mult") {
    import spark.implicits._
    val howGen = Gen.oneOf("left", "inner", "right", "full")
    val multGen = Gen.oneOf("all", "first", "last")
    check(forAll(sideGen, sideGen, howGen, multGen) {
      (l: List[(Int, Int)], r: List[(Int, Int)], how: String, m: String) =>
        val lhs = l.toDF("k", "lv")
        val rhs = r.toDF("k", "rv")
        val got = Joins.mergelistSteps(Seq(lhs, rhs),
            Seq(Joins.MergeStep(Seq("k"), how, m)))
          .select("k", "lv", "rv").collect()
          .map(x => (x.getInt(0),
            if (x.isNullAt(1)) None else Some(x.getInt(1)),
            if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSet
        val want = model(l, r, how, m)
        Prop(got == want) :| s"l=$l r=$r how=$how mult=$m got=$got want=$want"
    })
  }

  test("mergelist mult='error' refuses dups on exactly the lookup side(s)") {
    import spark.implicits._
    val howGen = Gen.oneOf("left", "inner", "right", "full")
    check(forAll(sideGen, sideGen, howGen) {
      (l: List[(Int, Int)], r: List[(Int, Int)], how: String) =>
        val symmetric = how == "inner" || how == "full"
        def hasDup(rows: List[(Int, Int)]) =
          rows.groupBy(_._1).exists(_._2.size > 1)
        val shouldErr =
          (if (symmetric) hasDup(l) || hasDup(r)
           else if (how == "right") hasDup(l)
           else hasDup(r))
        val res = scala.util.Try {
          Joins.mergelistSteps(Seq(l.toDF("k", "lv"), r.toDF("k", "rv")),
            Seq(Joins.MergeStep(Seq("k"), how, "error"))).count()
        }
        Prop(res.isFailure == shouldErr) :|
          s"l=$l r=$r how=$how failed=${res.isFailure} want=$shouldErr"
    })
  }
}
