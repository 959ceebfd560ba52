package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** The reference's `nan_is_na` knob (src/nafill.c:3-30, R/shift.R:29
  * `nafill(..., nan=NA)`): R distinguishes NA from NaN, and the nafill /
  * froll(na.rm=TRUE) family treats NaN as MISSING by default. SQL
  * doubles have no NA/NaN split — NaN is an ordinary (maximal) value —
  * so this expression maps NaN to null ahead of null-aware aggregates.
  *
  * Type-aware: for non-floating children (int, long, date, decimal) it
  * is the identity, which keeps `nafill` usable on every type the
  * reference supports without an analysis-time cast error (`isnan`
  * rejects DateType). Codegen stays inline in whole-stage pipelines.
  */
case class NanToNull(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  private def floating: Boolean = child.dataType match {
    case DoubleType | FloatType => true
    case _                      => false
  }

  override def nullable: Boolean = child.nullable || floating

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null || !floating) v
    else v match {
      case d: java.lang.Double if d.isNaN => null
      case f: java.lang.Float if f.isNaN  => null
      case other                          => other
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    if (!floating) ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    else {
      val nanCheck = child.dataType match {
        case DoubleType => s"Double.isNaN(${c.value})"
        case _          => s"Float.isNaN(${c.value})"
      }
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code =
        code"""
${c.code}
boolean ${ev.isNull} = ${c.isNull} || $nanCheck;
$javaType ${ev.value} = ${c.value};
""")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NanToNull =
    copy(child = newChild)
}

object NanToNull {
  def apply(c: Column): Column =
    GraftSqlBridge.column(new NanToNull(GraftSqlBridge.expression(c)))
}
