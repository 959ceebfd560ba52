package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fwrite's float formatting (src/fwrite.c:184-324 writeFloat64):
  * doubles print with up to 15 significant figures, trailing zeros
  * stripped, and the decimal-vs-scientific choice made by FIELD WIDTH —
  * decimal wins iff its width is within `scipen` characters of the
  * scientific width (R's options(scipen) penalty; src/fwrite.h:102,
  * tests.Rraw 2112.*). Scientific form is `d.ddde[+-]XX` with a
  * lower-case `e`, a mandatory exponent sign and 2 exponent digits
  * (3 when |exp| > 99). NaN (and null) print as the `na` string via
  * the CSV writer's nullValue; infinities as `Inf`/`-Inf`; zero —
  * either sign — as `0`.
  *
  * Spark's own CSV writer would print Java's shortest-round-trip form
  * (`1.0E7`, `1.23E-4`) — byte-for-byte different from the reference
  * on essentially every non-integral value, which surprises anyone
  * diffing exported CSVs.
  *
  * Rounding: the mathematically-exact decimal expansion (BigDecimal's
  * exact double constructor) is rounded HALF_UP at the 15th significant
  * digit — the same rule the reference implements (the 16th digit
  * decides, `if (l % 10 >= 5)` at src/fwrite.c:239) but computed
  * exactly, where the reference's table-driven double arithmetic can
  * sit ±2 units off in that deciding 16th digit. Divergence is
  * therefore confined to values within ~2e-16 relative distance of a
  * 15-digit rounding boundary; every fixture in tests.Rraw agrees.
  */
object Dtoa {

  /** The width rule's scientific-side length: digits + decimal sep (only
    * when more than one digit: `7e-04` has none) + "e±" + exponent
    * digits (src/fwrite.c:276).
    */
  private def sciWidth(sf: Int, exp: Int): Int =
    sf + (if (sf > 1) 1 else 0) + 2 + (if (math.abs(exp) > 99) 3 else 2)

  /** Format one double; null result = caller writes its `na` string
    * (NaN has no finite text form in the reference's CSVs either).
    * Static-forwarder friendly: called from generated Java code.
    */
  def format(x: Double, scipen: Int, dec: Char): UTF8String = {
    val s = formatString(x, scipen, dec)
    if (s == null) null else UTF8String.fromString(s)
  }

  def formatString(x: Double, scipen: Int, dec: Char = '.'): String = {
    if (java.lang.Double.isNaN(x)) null
    else if (java.lang.Double.isInfinite(x)) { if (x > 0) "Inf" else "-Inf" }
    else if (x == 0.0) "0" // covers -0.0 (sign branch below never sees it)
    else {
      val neg = x < 0
      val bd = new java.math.BigDecimal(math.abs(x))
        .round(new java.math.MathContext(15, java.math.RoundingMode.HALF_UP))
        .stripTrailingZeros()
      val digits = bd.unscaledValue().toString
      val sf = digits.length
      val exp = sf - 1 - bd.scale() // value = d.igits × 10^exp
      // field width in decimal notation (src/fwrite.c:262-270)
      val dr = sf - exp - 1 // digits right of the decimal point
      val width =
        if (dr <= 0) sf - dr // whole number: digits + |dr| zeros
        else if (sf > dr) sf + 1 // 1.234 / 123.4
        else dr + 2 // 0.1234 / 0.0001234 (leading "0.")
      val sb = new java.lang.StringBuilder(math.max(width, sf + 7) + 1)
      if (neg) sb.append('-')
      if (width <= sciWidth(sf, exp) + scipen) {
        if (dr <= 0) {
          sb.append(digits)
          var i = -dr
          while (i > 0) { sb.append('0'); i -= 1 }
        } else if (exp < 0) {
          sb.append('0').append(dec)
          var i = -exp - 1
          while (i > 0) { sb.append('0'); i -= 1 }
          sb.append(digits)
        } else {
          sb.append(digits, 0, exp + 1).append(dec)
            .append(digits, exp + 1, sf) // (start, end]-exclusive indices
        }
      } else {
        sb.append(digits.charAt(0))
        if (sf > 1) sb.append(dec).append(digits, 1, sf)
        sb.append('e').append(if (exp < 0) '-' else '+')
        val ae = math.abs(exp)
        if (ae < 10) sb.append('0')
        sb.append(ae)
      }
      sb.toString
    }
  }
}

/** Column form of [[Dtoa.format]] — a unary expression that stays
  * inside whole-stage codegen via a static call (the fwrite projection
  * is the last stage before the file sink; falling out of codegen there
  * would interpret every other written column too).
  */
case class DtoaExpr(child: Expression, scipen: Int, dec: Char = '.')
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Dtoa.format(input.asInstanceOf[Double], scipen, dec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
${c.code}
UTF8String ${ev.value} = ${c.isNull} ? null :
  graft.sources.Dtoa.format(${c.value}, $scipen, (char) ${dec.toInt});
boolean ${ev.isNull} = ${ev.value} == null;
""")
  }

  override protected def withNewChildInternal(newChild: Expression): DtoaExpr =
    copy(child = newChild)
}

object DtoaExpr {
  def apply(c: Column, scipen: Int): Column = apply(c, scipen, '.')
  def apply(c: Column, scipen: Int, dec: Char): Column =
    GraftSqlBridge.column(
      new DtoaExpr(GraftSqlBridge.expression(c.cast("double")), scipen, dec))
}
