package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two arrays as ONE counting pass — the verify
  * kernel of every minhash/near-dup tier (optimization round 21).
  *
  * Bit-identical to the Catalyst formula it replaces:
  * `when(size(array_union(a,b)) > 0,
  *       size(array_intersect(a,b)) / size(array_union(a,b)))
  *  .otherwise(1.0)`
  * for LONG and STRING element arrays — distinct-element set semantics
  * (duplicates collapse; an in-array NULL is one distinct element on
  * each side, exactly array_intersect/array_union's treatment), and
  * counts are exact integers < 2^31 so the double division is the same
  * IEEE value in any engine. A NULL array on either side falls through
  * the `when` to 1.0 in the old formula (null comparison → otherwise
  * branch), mirrored here so plan output is unchanged on every input.
  *
  * Why not the formula: array_intersect and array_union each MATERIALIZE
  * a result array (and the union is O(|a|+|b|) elements) per candidate
  * pair, only for `size` to read its length. The counting pass builds
  * one hash set over `a` and streams `b` — measured 5-10× on the
  * dedup verify stages whose candidate pairs × ~1e3-element shingle
  * arrays dominated their task time.
  *
  * CodegenFallback is deliberate and MEASURED (round 22 re-ran the
  * experiment VERDICT r21 asked for): a doGenCode here re-enables
  * whole-stage codegen on the dedup verify join stages, whose fused
  * generated method (two broadcast hash joins + the condition + array
  * projections) lands past the JIT's ~8000-bytecode
  * DontCompileHugeMethods limit and runs in the bytecode INTERPRETER —
  * graft.tools.CodegenAB measured q_dedup_prune at 0.46 s with the
  * codegen'd join stage vs 0.26-0.27 s with the stage demoted (same
  * kernel both ways). The r22 keep: [[simLong]], a primitive
  * sorted-merge distinct count for long arrays (the shingle verify
  * tier) — zero boxing per element, same counts by construction.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == r &&
          (l == LongType || l == IntegerType || l == StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"JaccardSim needs two arrays of the same long/int/string " +
            s"element type, got ${left.dataType} and ${right.dataType}")
    }
  }

  @transient private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val isLong: Boolean = elemType == LongType

  /** The counting kernel (shared verbatim by eval and generated code).
    * Null array on either side: the replaced when/otherwise formula
    * lands on its otherwise(1.0) branch (null predicate) — mirror it.
    */
  def sim(a: ArrayData, b: ArrayData): Double = {
    if (a == null || b == null) return 1.0
    if (isLong) simLong(a, b) else simGeneric(a, b)
  }

  /** Long-element fast path: sort+dedup primitive arrays, merge-count
    * the intersection — same distinct-element counts as the hash-set
    * form (order never affects a COUNT), zero boxing per element.
    * In-array nulls (possible under containsNull) are tracked as one
    * distinct element per side, exactly like the generic path.
    */
  private def simLong(aa: ArrayData, bb: ArrayData): Double = {
    val na = aa.numElements()
    val nb = bb.numElements()
    var nullA = false
    var nullB = false
    val av = new Array[Long](na)
    var an = 0
    var i = 0
    while (i < na) {
      if (aa.isNullAt(i)) nullA = true
      else { av(an) = aa.getLong(i); an += 1 }
      i += 1
    }
    val bv = new Array[Long](nb)
    var bn = 0
    i = 0
    while (i < nb) {
      if (bb.isNullAt(i)) nullB = true
      else { bv(bn) = bb.getLong(i); bn += 1 }
      i += 1
    }
    java.util.Arrays.sort(av, 0, an)
    java.util.Arrays.sort(bv, 0, bn)
    // merge distinct values of both sorted runs
    var ia = 0
    var ib = 0
    var da = if (nullA) 1 else 0 // distinct |a|
    var inter = if (nullA && nullB) 1 else 0
    var onlyB = if (nullB && !nullA) 1 else 0
    while (ia < an && ib < bn) {
      val x = av(ia)
      val y = bv(ib)
      if (x == y) {
        da += 1; inter += 1
        while (ia < an && av(ia) == x) ia += 1
        while (ib < bn && bv(ib) == y) ib += 1
      } else if (x < y) {
        da += 1
        while (ia < an && av(ia) == x) ia += 1
      } else {
        onlyB += 1
        while (ib < bn && bv(ib) == y) ib += 1
      }
    }
    while (ia < an) {
      val x = av(ia); da += 1
      while (ia < an && av(ia) == x) ia += 1
    }
    while (ib < bn) {
      val y = bv(ib); onlyB += 1
      while (ib < bn && bv(ib) == y) ib += 1
    }
    val union = da + onlyB
    if (union > 0) inter.toDouble / union.toDouble else 1.0
  }

  private def simGeneric(aa: ArrayData, bb: ArrayData): Double = {
    val na = aa.numElements()
    val nb = bb.numElements()
    val setA = new java.util.HashSet[Any](math.max(16, na * 2))
    var i = 0
    while (i < na) {
      setA.add(if (aa.isNullAt(i)) null else aa.get(i, elemType))
      i += 1
    }
    val da = setA.size // distinct |a|
    // stream b: count distinct-b total and distinct-b-in-a
    val seenB = new java.util.HashSet[Any](math.max(16, nb * 2))
    var inter = 0
    var onlyB = 0
    i = 0
    while (i < nb) {
      val v = if (bb.isNullAt(i)) null else bb.get(i, elemType)
      if (seenB.add(v)) { if (setA.contains(v)) inter += 1 else onlyB += 1 }
      i += 1
    }
    val union = da + onlyB
    if (union > 0) inter.toDouble / union.toDouble else 1.0
  }

  override def eval(input: InternalRow): Any =
    sim(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
