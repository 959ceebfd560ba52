package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** setNumericRounding semantics (man/setNumericRounding.Rd: "rounding
  * the last 2 bytes off the significand" of a double before joining /
  * grouping / ordering; values 0, 1 or 2 bytes).
  *
  * The reference applies the knob globally inside its sort/join
  * kernels; here it is an explicit expression — round both join keys
  * with the same `bytes` and equality behaves like the reference's
  * rounded comparison, while staying a plain deterministic column the
  * optimizer can push/reorder like any other. Round-to-nearest on the
  * significand: add half of the dropped range, then mask. A carry out
  * of the significand correctly increments the exponent (IEEE-754
  * layout); NaN/Inf pass through unchanged.
  *
  * NEGATIVE-TIE PARITY with dtwiddle (src/forder.c:425-440): the
  * reference rounds in the sign-flipped MONOTONE encoding (negatives
  * have all bits complemented) while this expression rounds raw
  * sign-magnitude bits — yet the induced equivalence classes are
  * identical. With granule g = 2^(8·bytes) and a negative key's
  * low field L: the monotone low field is g−1−L, so dtwiddle's
  * round-up condition (monotone L ≥ g/2) is exactly L < g/2 — both
  * schemes cut the negative axis at the same |Q·g + g/2| boundaries
  * and only LABEL the classes differently (a fixed −1 shift), which
  * equality never observes. The half-tie L = g/2 rounds away from
  * zero in both. Near zero both merge (−g/2, +g/2): here via
  * −0.0 ≡ 0.0, there via the complement carry. Proven empirically in
  * Round5Spec ("RoundMantissa groups exactly like dtwiddle").
  */
case class RoundMantissa(child: Expression, bytes: Int)
    extends UnaryExpression {
  require(bytes >= 0 && bytes <= 2,
    s"RoundMantissa: bytes must be 0, 1 or 2 (reference surface), got $bytes")

  override def dataType: DataType = DoubleType

  /** Kernel shared by eval and generated code (real codegen since
    * optimization round 22 — a rounded join KEY with a fallback
    * expression demoted the whole join stage out of whole-stage
    * codegen).
    */
  def roundM(v: Double): Double = {
    if (bytes == 0 || java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      val mask = (1L << (8 * bytes)) - 1L
      val rounded = (bits + (mask >>> 1) + 1L) & ~mask
      val r = java.lang.Double.longBitsToDouble(rounded)
      // An exponent carry is correct rounding (0.999… → 1.0) EXCEPT when
      // it promotes a finite value to Inf (all-ones significand at the
      // top exponent): a rounded KEY must never merge finite values with
      // true infinities, so fall back to truncation there.
      if (java.lang.Double.isInfinite(r))
        java.lang.Double.longBitsToDouble(bits & ~mask)
      else r
    }
  }

  override def nullSafeEval(input: Any): Any =
    roundM(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRoundM", this,
      classOf[RoundMantissa].getName)
    defineCodeGen(ctx, ev, c => s"$ref.roundM($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RoundMantissa =
    copy(child = newChild)
}

object RoundMantissa {
  def apply(c: Column, bytes: Int): Column =
    GraftSqlBridge.column(
      new RoundMantissa(GraftSqlBridge.expression(c.cast("double")), bytes))
}
