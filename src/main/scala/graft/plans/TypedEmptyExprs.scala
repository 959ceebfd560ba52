package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType}

/** froll's n=0 empty-window SUM value, typed exactly like the n>=1
  * window `sum(c)` would be (ADVICE r15: the n=0 fast path returned a
  * DoubleType 0.0 while `sum` over an integral column yields LongType,
  * so the output schema flipped with the window width). The type
  * mapping delegates to Catalyst's own `Sum(child).dataType`, so it can
  * never drift from Spark's aggregate typing; `child` is never
  * evaluated — the expression is foldable and the optimizer collapses
  * it to a typed zero literal, keeping the n=0 path a constant.
  */
case class SumEmptyZero(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.catalyst.expressions.aggregate.Sum(child).dataType

  override def foldable: Boolean = true
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = dataType match {
    case LongType => 0L
    case dt: DecimalType => Decimal(java.math.BigDecimal.ZERO, dt.precision, dt.scale)
    case DoubleType => 0.0
    // Sum also admits ANSI interval types: year-month is int-backed,
    // day-time long-backed
    case _: org.apache.spark.sql.types.YearMonthIntervalType => 0
    case _ => 0L
  }

  override protected def withNewChildInternal(newChild: Expression): SumEmptyZero =
    copy(child = newChild)
}

object SumEmptyZero {
  def apply(c: Column): Column =
    GraftSqlBridge.column(new SumEmptyZero(GraftSqlBridge.expression(c)))
}
