package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial window hashing for winnowed duplicate-span
  * dedup (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — whose own
  * construction is a ROLLING hash; the paper's §5 "experience" section
  * hashes k-grams incrementally for exactly this reason).
  *
  * Fingerprint function (engine-portable, adjudicated by the DuckDB
  * oracle definitionally):
  *
  *   h(i) = ( Σ_{j=0..k-1} cp[i+j] · B^(k-1-j) ) mod M
  *
  * over the UNICODE CODE POINTS cp of the text, with B = 1e9+7 and
  * M = 2^61 − 1 (Mersenne). The Spark side computes it with the O(1)
  * rolling update per character; the oracle computes the same sum
  * directly per window with 128-bit intermediates — same function, two
  * evaluation orders, bit-identical results. 61-bit fingerprints keep
  * corpus-scale birthday collisions negligible (~n²/2^62).
  *
  * This replaces the round-7 per-window md5 form (one full digest per
  * character position — the measured scale wart: q_span_docs 10 s warm
  * at sf0.1, cost proportional to input bytes, i.e. straight into the
  * 100 TB bill). The roll is one mulmod+add per character.
  */
object WinnowHash {
  /** Mersenne modulus 2^61 − 1. */
  val M: Long = (1L << 61) - 1
  /** Polynomial base (any value in (0, M) works; classic prime). */
  val B: Long = 1000000007L

  /** (a · b) mod M for a, b in [0, M). 128-bit product via
    * Math.multiplyHigh, then the Mersenne fold 2^61 ≡ 1 (mod M):
    * x = hi·2^64 + lo ≡ (lo & M) + ((lo >>> 61) | (hi << 3)).
    */
  @inline def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & M) + ((lo >>> 61) | (hi << 3))
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** B^e mod M. */
  def powMod(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = mulMod(r, B); i += 1 }
    r
  }

  /** All k-codepoint-window hashes of `cp`, length n−k+1 (empty when
    * n < k). O(n) mulmods via the rolling update.
    */
  def windowHashes(cp: Array[Int], k: Int): Array[Long] = {
    val n = cp.length
    if (n < k) return Array.emptyLongArray
    val powK1 = powMod(k - 1)
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var j = 0
    while (j < k) { h = mulMod(h, B) + cp(j); if (h >= M) h -= M; j += 1 }
    out(0) = h
    var i = 1
    while (i <= n - k) {
      var t = h - mulMod(cp(i - 1).toLong, powK1)
      if (t < 0) t += M
      h = mulMod(t, B) + cp(i + k - 1)
      if (h >= M) h -= M
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowing selection: distinct minima of each w-run of window
    * hashes, first-occurrence order. O(n) via a monotonic deque
    * (indices of candidate minima, increasing hash value); ties keep
    * the EARLIEST index, which is value-identical to the oracle's
    * per-run `min(...)` window — selection is by VALUE, so tie policy
    * cannot change the output set.
    */
  def winnowSelect(hashes: Array[Long], w: Int): Array[Long] = {
    val n = hashes.length
    if (n < w) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    var i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) > hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  def codePoints(s: UTF8String): Array[Int] = s.toString.codePoints().toArray

  /** Oracle-side literal: [B^(k-1), …, B^1, B^0] mod M, as DuckDB
    * HUGEINT list text — the power table the definitional SQL sum
    * multiplies each code point by.
    */
  def powTableSql(k: Int): String =
    (0 until k).map(j => powMod(k - 1 - j) + "::HUGEINT").mkString("[", ", ", "]")
}

/** text → array<long> winnowed fingerprints: window-poly-hash + run-min
  * selection + distinct, fused in ONE O(L) pass per row (no interpreted
  * HOF re-evaluation, no intermediate array column). Null text → null.
  *
  * CodegenFallback is deliberate and round-22-re-measured: a real
  * doGenCode re-enables whole-stage codegen on the span-scan
  * mega-projection, whose one generated method exceeds the JIT's
  * ~8000-bytecode limit and runs interpreted — slower than the demoted
  * per-expression path (graft.tools.CodegenAB; see TextKernelExprs).
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, s"winnow: k=$k, w=$w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Kernel shared by eval and generated code. */
  def winnow(s: UTF8String): ArrayData =
    new GenericArrayData(
      WinnowHash.winnowSelect(
        WinnowHash.windowHashes(WinnowHash.codePoints(s), k), w))

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}

object WinnowFingerprintsExpr {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(
      WinnowFingerprintsExpr(GraftSqlBridge.expression(text), k, w))
}

/** text → array<long> of ALL k-window polynomial hashes (the stage-1
  * array alone, for diagnostics/specs; the production span path uses
  * the fused [[WinnowFingerprintsExpr]]).
  */
case class WindowPolyHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, s"windowPolyHashes: k=$k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Kernel shared by eval and generated code. */
  def hashes(s: UTF8String): ArrayData =
    new GenericArrayData(
      WinnowHash.windowHashes(WinnowHash.codePoints(s), k))

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): WindowPolyHashesExpr =
    copy(child = newChild)
}

object WindowPolyHashesExpr {
  def apply(text: Column, k: Int): Column =
    GraftSqlBridge.column(
      WindowPolyHashesExpr(GraftSqlBridge.expression(text), k))
}
