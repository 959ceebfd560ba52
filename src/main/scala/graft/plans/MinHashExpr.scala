package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native shingling + MinHash kernels (SURVEY.md §4.2 "custom
  * Expression" tier). Two single-pass JVM loops replace the interpreted
  * higher-order-function formulation (transform/slice/array_join ×
  * numHashes), which dominated dedup runtime ~10:1.
  */

/** array<string> tokens → array<long> distinct word-k-shingle hashes.
  *
  * Each token is xxhash64'd ONCE; a k-gram's hash is the polynomial
  * combination of its token hashes — no shingle strings are ever
  * built. Matches the reference semantics of word shingles as set
  * members (src-free: our own extension operator).
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** The per-row kernel. CodegenFallback deliberate — the round-22
    * CodegenAB measurement (see PortableShingles) showed the re-enabled
    * whole-stage method blows the JIT bytecode limit and runs slower.
    */
  def shingle(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 0L else XxHash64Function.hash(s, StringType, 42L)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (n < k) {
      var h = 1125899906842597L
      var j = 0
      while (j < n) { h = h * 0x100000001B3L + th(j); j += 1 }
      out += h
    } else {
      i = 0
      while (i + k <= n) {
        var h = 1125899906842597L
        var j = i
        while (j < i + k) { h = h * 0x100000001B3L + th(j); j += 1 }
        if (seen.add(h)) out += h
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(tokens), k))
}

/** array<long> shingle hashes → array<long> MinHash signature.
  *
  * The independent hash family is derived by affine mixing
  * (h_j = A_j·h + B_j over Z/2^64, odd A_j ⇒ bijective — a standard
  * universal family), so the signature is one tight loop per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val A: Array[Long] = Array.tabulate(numHashes) { j =>
    var z = j.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) | 1L
  }
  @transient private lazy val B: Array[Long] = Array.tabulate(numHashes) { j =>
    var z = (j.toLong + 7919L) * 0x94D049BB133111EBL + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z ^ (z >>> 31)
  }

  /** Kernel shared by eval and generated code. */
  def sig(arr: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val hj = A(j) * h + B(j)
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-level entry over shingle-hash arrays. */
  def apply(shingleHashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(shingleHashes), numHashes))
}
