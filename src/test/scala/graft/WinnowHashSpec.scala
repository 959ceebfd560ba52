package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.WinnowHash

/** Round-8: the Karp-Rabin rolling rewrite of winnowed span dedup.
  * The rolling O(1)-per-char update must compute the IDENTICAL
  * polynomial Σ cp·B^j mod 2^61−1 as the definitional sum the DuckDB
  * oracle evaluates — checked here against a BigInt reference, plus
  * the winnowing selection against a naive per-run min.
  */
class WinnowHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = BigInt(WinnowHash.M)
  private val B = BigInt(WinnowHash.B)

  /** Definitional window hash: the exact sum the oracle computes. */
  private def refHashes(s: String, k: Int): Seq[Long] = {
    val cp = s.codePoints().toArray
    (0 to cp.length - k).map { i =>
      (0 until k).map(j => BigInt(cp(i + j)) * B.modPow(k - 1 - j, M))
        .sum.mod(M).toLong
    }
  }

  private def refSelect(hs: Seq[Long], w: Int): Seq[Long] =
    (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct

  test("mulMod matches BigInt across magnitude extremes") {
    val vals = Seq(0L, 1L, 2L, WinnowHash.B, (1L << 31) - 1,
      (1L << 45) + 12345, WinnowHash.M - 1, WinnowHash.M - 2,
      1234567890123456789L % WinnowHash.M)
    for (a <- vals; b <- vals)
      assert(WinnowHash.mulMod(a, b) == (BigInt(a) * b).mod(M).toLong,
        s"mulMod($a, $b)")
  }

  test("rolling window hashes equal the definitional polynomial") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa",           // degenerate repetition
      "0123456789 abcdef 0123456789",
      "καλημέρα κόσμε unicode κείμενο εδώ", // non-ASCII code points
      "exactly-k",                           // length == k edge
      "short")                               // length < k → empty
    for (t <- texts; k <- Seq(5, 9, 20) if true) {
      val got = WinnowHash.windowHashes(t.codePoints().toArray, k).toSeq
      assert(got == refHashes(t, k), s"k=$k text='$t'")
    }
  }

  test("deque winnow selection equals naive per-run min, distinct in order") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, 8, 9, 40, 200); w <- Seq(1, 3, 8)) {
      // small value range forces ties and repeated minima
      val hs = Seq.fill(n)(rnd.nextInt(12).toLong)
      val got = WinnowHash.winnowSelect(hs.toArray, w).toSeq
      val want = if (n < w) Seq.empty else refSelect(hs, w)
      assert(got == want, s"n=$n w=$w hs=$hs")
    }
  }

  test("fused expression == staged hash+select; null text → null") {
    val df = Seq(
      Some("the quick brown fox jumps over the lazy dog and runs away"),
      Some("tiny"), Some(""), None).toDF("t")
    val out = df.select(
      graft.dedup.Dedup.winnowFingerprints(col("t"), 5, 3).as("fused"),
      graft.dedup.Dedup.winnowHashes(col("t"), 5).as("wh")).collect()
    for (r <- out) {
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else {
        val staged = refSelect(r.getSeq[Long](1), 3)
        val want = if (r.getSeq[Long](1).length < 3) Seq.empty else staged
        assert(r.getSeq[Long](0) == want)
      }
    }
  }

  test("winnowing guarantee survives the hash swap (offset-independent)") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      1L -> ("AAAA BBBB " + shared),
      2L -> (shared + " CCCC DDDD"),
      3L -> "zz ww qq vv kk pp mm nn zz ww qq",
      4L -> "tiny").toDF("doc_id", "text")
    val flagged = graft.dedup.Dedup.spanFlaggedDocs(df, "doc_id", "text",
      k = 5, w = 3).as[Long].collect().toSet
    assert(flagged == Set(1L, 2L))
  }

  test("powTableSql lists B^(k-1)..B^0 mod M") {
    val sql = WinnowHash.powTableSql(3)
    val want = Seq(WinnowHash.mulMod(WinnowHash.B, WinnowHash.B),
      WinnowHash.B, 1L).map(_ + "::HUGEINT").mkString("[", ", ", "]")
    assert(sql == want)
  }
}
