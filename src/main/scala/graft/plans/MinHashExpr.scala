package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature kernel (SURVEY.md §4.2 "custom Expression"
  * tier): array<string> shingles → array<long> of `numHashes` minima.
  *
  * One xxhash64 per shingle; the independent hash family is derived by
  * affine mixing (h_j = A_j·h + B_j over Z/2^64 — a standard universal
  * family), so the whole signature is a single tight JVM loop instead of
  * numHashes interpreted transform+array_min passes. ~20× less work than
  * the higher-order-function formulation on long documents.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val A: Array[Long] = Array.tabulate(numHashes) { j =>
    // splitmix64 of j → odd multiplier (odd ⇒ bijective mod 2^64)
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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XxHash64Function.hash(s, StringType, 42L)
        var j = 0
        while (j < numHashes) {
          val hj = A(j) * h + B(j)
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-level entry: minhash(shingleArray, 32). Uses the classic
    * Column↔Expression bridge (Spark 4 removed Column.expr).
    */
  def apply(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(shingles), numHashes))
  }
}
