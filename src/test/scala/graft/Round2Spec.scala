package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Windows}

/** Round-2 additions: scale guards, option-surface parity (frank last/
  * na.last, foverlaps mult/which, gtail, SJ), null-correct adaptive
  * frolls, log-space cumprod, kmeans-lite IVF, portable hash kernels.
  */
class Round2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- global-window scale guard --------------------------------------

  test("windows reject empty partition keys unless allowGlobal") {
    val df = Seq((1, 1.0), (2, 2.0)).toDF("o", "v")
    val e = intercept[IllegalArgumentException] {
      df.withColumn("s", Windows.shift($"v", 1, Nil, Seq($"o".asc))).collect()
    }
    assert(e.getMessage.contains("allowGlobal"))
    // topK by=Nil plans TakeOrderedAndProject — scale-safe, no opt-in
    // needed since round 11
    assert(Windows.topK(df, Nil, Seq($"v".desc), 1).count() == 1)
    // explicit opt-in works
    val ok = df.withColumn("s",
      Windows.shift($"v", 1, Nil, Seq($"o".asc), allowGlobal = true)).collect()
    assert(ok.length == 2)
  }

  // ---- frank ties="last" + na.last ------------------------------------

  test("frank ties=last reverses appearance order within ties") {
    val df = Seq(("g", 10, 1), ("g", 10, 2), ("g", 10, 3), ("g", 20, 4))
      .toDF("g", "v", "id")
    val out = Windows.frank(df, Seq($"v".asc), Seq($"v"), "last", Seq("g"),
      "rk", appearance = Seq($"id".asc))
      .select($"id", $"rk").as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 3, 2 -> 2, 3 -> 1, 4 -> 4))
  }

  test("frankNa keep/true/false place nulls per na.last") {
    val df = Seq((1, Some(5.0)), (2, None), (3, Some(1.0))).toDF("id", "v")
    def ranks(naLast: String) =
      Windows.frankNa(df, $"v", desc = false, ties = "min", by = Nil,
        naLast = naLast, out = "rk", allowGlobal = true)
        .select($"id", $"rk").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(ranks("keep") == Map(1 -> 2, 2 -> -1, 3 -> 1))   // NA rank stays NA
    assert(ranks("true") == Map(1 -> 2, 2 -> 3, 3 -> 1))    // NA ranks last
    assert(ranks("false") == Map(1 -> 3, 2 -> 1, 3 -> 2))   // NA ranks first
  }

  // ---- froll null semantics -------------------------------------------

  test("froll partial=true nulls frames containing a null (na.rm=FALSE)") {
    val df = Seq((1, Some(1.0)), (2, None), (3, Some(3.0)), (4, Some(4.0)))
      .toDF("o", "v").withColumn("g", lit("a"))
    val out = df.withColumn("r",
      Windows.froll("sum", $"v", 2, Seq("g"), Seq($"o".asc), partial = true))
      .select($"o", $"r").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == 1.0)        // partial leading window, no null inside
    assert(out(2) == null)       // frame (1, null)
    assert(out(3) == null)       // frame (null, 3)
    assert(out(4) == 7.0)
  }

  test("frollAdaptive keeps nulls in the physical frame (no silent LOCF pull)") {
    // frame at o=4 with an=2 is (null, 4.0) → null result, NOT agg(3,4)
    val df = Seq((1, Some(1.0), 1), (2, Some(2.0), 1), (3, None, 1), (4, Some(4.0), 2))
      .toDF("o", "v", "an").withColumn("g", lit("a"))
    val out = df.withColumn("r",
      Windows.frollAdaptive("sum", $"v", $"an", 4, Seq("g"), Seq($"o".asc)))
      .select($"o", $"r").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == 1.0)
    assert(out(2) == 2.0)
    assert(out(3) == null)       // the row itself is null
    assert(out(4) == null)       // an=2 frame is (null, 4)
  }

  // ---- log-space cumprod ----------------------------------------------

  test("cum(prod) log-space matches exact product with sign/zero/null handling") {
    val df = Seq((1, 2.0), (2, -3.0), (3, 4.0), (4, 0.0), (5, 5.0))
      .toDF("o", "v").withColumn("g", lit("a"))
    val out = df
      .withColumn("lp", Windows.cum("prod", $"v", Seq("g"), Seq($"o".asc)))
      .withColumn("ep", Windows.cum("prod_exact", $"v", Seq("g"), Seq($"o".asc)))
      .select($"o", $"lp", $"ep").collect()
    out.foreach { r =>
      val (lp, ep) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(lp - ep) <= 1e-9 * math.max(1.0, math.abs(ep)),
        s"o=${r.getInt(0)}: log-space $lp vs exact $ep")
    }
    // null propagates from its position onward
    val dfn = Seq((1, Some(2.0)), (2, None), (3, Some(3.0))).toDF("o", "v")
      .withColumn("g", lit("a"))
    val rs = dfn.withColumn("lp", Windows.cum("prod", $"v", Seq("g"), Seq($"o".asc)))
      .select($"o", $"lp").collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(!rs(1) && rs(2) && rs(3))
  }

  // ---- gtail / tailK ---------------------------------------------------

  test("tailK returns the last k rows per group in original order semantics") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9)).toDF("g", "o")
    val out = Windows.tailK(df, Seq("g"), Seq($"o".asc), 2)
      .select($"g", $"o").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 2), ("a", 3), ("b", 9)))
  }

  // ---- multAgg ≡ mult --------------------------------------------------

  test("multAgg matches window-based mult for first and last") {
    val x = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30)).toDF("k", "p", "q")
    val i = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "tag")
    for (m <- Seq("first", "last")) {
      val viaAgg = Joins.multAgg(x, i, Seq("k"), m, Seq($"p", $"q"))
        .select($"k", $"p", $"q", $"tag").collect().map(_.toString).sorted.toSeq
      val viaWin = Joins.mult(x, i, Seq("k"), m, Seq($"p", $"q"), probeUnique = true)
        .select($"k", $"p", $"q", $"tag").collect().map(_.toString).sorted.toSeq
      assert(viaAgg == viaWin, s"mult=$m")
    }
  }

  // ---- foverlaps mult= / which= ---------------------------------------

  test("overlapMult first keeps earliest-starting y match per x row") {
    val x = Seq((1, 0.0, 10.0), (2, 50.0, 60.0)).toDF("xid", "xs", "xe")
    val y = Seq((100, 5.0, 6.0), (101, 2.0, 3.0), (102, 55.0, 58.0))
      .toDF("yid", "ys", "ye")
    val out = Joins.overlapMult(x, y, Nil, "xs", "xe", "ys", "ye", "any", "first")
      .select($"xid", $"yid").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 101), (2, 102)))
  }

  test("overlapWhich returns only matching id pairs") {
    val x = Seq((1, 0.0, 10.0), (2, 50.0, 60.0)).toDF("xid", "xs", "xe")
    val y = Seq((100, 5.0, 6.0), (101, 70.0, 80.0)).toDF("yid", "ys", "ye")
    val out = Joins.overlapWhich(x, y, Nil, "xs", "xe", "ys", "ye", "xid", "yid")
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 100)))
  }

  // ---- SJ --------------------------------------------------------------

  test("SJ builds a keyed sorted literal table") {
    val sj = DT.SJ(spark, Seq("k", "v"), Seq(Seq(2, "b"), Seq(1, "a")))
    assert(sj.key == Seq("k", "v"))
    assert(sj.df.select($"k").as[Int].collect().toSeq.sorted == Seq(1, 2))
  }

  // ---- dcastComplete: no spurious null pivot column --------------------

  test("dcastComplete emits no 'null' column for completed combos") {
    val df = Seq(("x", "p", 1.0), ("y", "q", 2.0)).toDF("lhs", "rhs", "v")
    val wide = graft.operators.Reshape.dcastComplete(df, Seq("lhs"), "rhs", "v",
      first(_, ignoreNulls = true))
    assert(wide.columns.toSet == Set("lhs", "p", "q"))
    assert(wide.count() == 2)
  }

  // ---- fromRows type inference ----------------------------------------

  test("fromRows infers Boolean/Timestamp/Date and rejects exotic types") {
    val dt = DT.fromRows(spark, Seq("b", "ts", "d"),
      Seq(Seq(true, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
        java.sql.Date.valueOf("2024-01-02"))))
    val tps = dt.df.schema.fields.map(_.dataType.typeName).toSeq
    assert(tps == Seq("boolean", "timestamp", "date"))
    intercept[IllegalArgumentException] {
      DT.fromRows(spark, Seq("bad"), Seq(Seq(new Object)))
    }
  }

  // ---- kmeans-lite IVF -------------------------------------------------

  test("kmeansFit is deterministic and assigns each vector to its argmax centroid") {
    val vecs = (0 until 40).map { i =>
      val base = i % 4
      (i.toLong, (0 until 8).map(d =>
        (if (d == base * 2) 1.0 else 0.05) + 0.001 * ((i * 7 + d) % 5)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val c1 = graft.sim.Similarity.kmeansFit(df, "vec_id", "embedding", k = 4, iters = 3)
    val c2 = graft.sim.Similarity.kmeansFit(df, "vec_id", "embedding", k = 4, iters = 3)
    assert(c1 == c2, "fit must be bit-deterministic across runs")
    val assigned = graft.sim.Similarity.ivfAssign(df, "embedding", c1)
      .select($"vec_id", $"ivf_cell").as[(Long, Int)].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    vecs.foreach { case (id, v) =>
      val best = c1.indices.maxBy(ci => cos(v.toSeq, c1(ci)))
      val bestSim = cos(v.toSeq, c1(best))
      val gotSim = cos(v.toSeq, c1(assigned(id)))
      assert(math.abs(bestSim - gotSim) < 1e-12,
        s"vec $id assigned to ${assigned(id)} (sim $gotSim) but argmax is $best ($bestSim)")
    }
  }

  // ---- portable hash kernels ------------------------------------------

  test("portable kernels match a scala-side md5 reference model") {
    import graft.plans.PortableHash
    // a60 equals parsing the md5 prefix
    assert(PortableHash.a60("hello") ==
      java.lang.Long.parseLong(PortableHash.md5Hex("hello").substring(0, 15), 16))
    // rolling hash portable: model the fold in plain scala
    val text = "one two three four"
    val toks = text.trim.split("\\s+").toSeq
    val expected = toks.foldLeft(0L) { (acc, t) =>
      val rot = ((acc & ((1L << 54) - 1)) << 5) | (acc >>> 54)
      (rot ^ PortableHash.a60(t)) & ((1L << 59) - 1)
    }
    val got = Seq(text).toDF("text")
      .select(graft.text.TextFunctions.rollingHashPortable($"text").as("rh"))
      .as[Long].head()
    assert(got == expected)
    // simhash kernel: votes of a single token equal its own bits (60-bit)
    val one = Seq("solitary").toDF("t")
      .select(graft.plans.PortableSimHash(array($"t")).as("sig")).as[Long].head()
    assert(one == PortableHash.a60("solitary"))
  }

  test("minhashPairsPortable finds the planted near-duplicate") {
    val docs = (
      (1 to 30).map(i => (i.toLong, s"unique document number $i with filler words ${i * 17} and ${i * 31}")) ++
        Seq((100L, "the quick brown fox jumps over the lazy dog again and again today"),
          (101L, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
      ).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.minhashPairsPortable(docs, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)))
  }
}

/** Wide-table print truncation (reference wide-print `...` elision). */
class PrintWideSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("printTopBottom elides middle columns beyond maxCols") {
    val df = Seq((1, 2, 3, 4, 5, 6)).toDF("a", "b", "c", "d", "e", "f")
    val out = DT(df).printTopBottom(Seq($"a".asc), n = 5, maxCols = 4)
    val header = out.linesIterator.next()
    assert(header == Seq("a", "b", "...", "e", "f").mkString("\t"))
    val row = out.linesIterator.drop(1).next()
    assert(row == Seq("1", "2", "...", "5", "6").mkString("\t"))
    // narrow tables print unchanged
    val full = DT(df).printTopBottom(Seq($"a".asc), n = 5)
    assert(full.linesIterator.next() == df.columns.mkString("\t"))
  }
}

/** Band auto-tuning: S-curve inflection tracks the target threshold. */
class TuneBandsSpec extends AnyFunSuite {
  test("tuneBands picks steeper banding for higher thresholds") {
    val (bLow, rLow) = graft.dedup.Dedup.tuneBands(32, 0.3)
    val (bHigh, rHigh) = graft.dedup.Dedup.tuneBands(32, 0.9)
    assert(bLow * rLow == 32 && bHigh * rHigh == 32)
    // low threshold → many bands of few rows; high → few bands of many rows
    assert(bLow > bHigh && rLow < rHigh)
    // inflection near the target
    def inflection(b: Int, r: Int) = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(inflection(bHigh, rHigh) - 0.9) < 0.25)
  }
}

/** CJ option surface + positional rbindlist (tests.Rraw-mined parity). */
class ConstructorOptionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("CJ(unique=TRUE) dedupes inputs; sorted=FALSE skips the sort and key") {
    val cj = DT.CJopt(spark, sorted = true, unique = true)(
      "a" -> Seq(2, 1, 2), "b" -> Seq("x", "x"))
    assert(cj.df.count() == 2)
    assert(cj.df.select($"a").as[Int].collect().toSeq == Seq(1, 2))
    val unsorted = DT.CJopt(spark, sorted = false, unique = false)(
      "a" -> Seq(2, 1))
    assert(unsorted.key.isEmpty && unsorted.df.count() == 2)
  }

  test("rbindlist(use.names=FALSE) binds by position under head's names") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(("y", 2)).toDF("p", "q")   // different names AND types
    // same arity, positional bind: b's p→k (string!) — type promotion to string
    val c = Seq((3, "z")).toDF("q", "p")   // swapped names, compatible types
    val out = graft.operators.Reshape.rbindlist(Seq(a, c), fill = false,
      useNames = false)
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.as[(Int, String)].collect().toSet == Set((1, "x"), (3, "z")))
    intercept[IllegalArgumentException] {
      graft.operators.Reshape.rbindlist(
        Seq(a, Seq(Tuple1(1)).toDF("solo")), useNames = false, fill = false)
    }
  }
}
