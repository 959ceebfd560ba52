package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (curation canonicalization tier).
  *
  * Web corpora mix composed and decomposed encodings of the same text
  * ("é" as U+00E9 vs e + U+0301): every hash-keyed operator downstream
  * — exact dedup, minhash shingles, fingerprints, group-bys on text —
  * silently treats them as different documents. Normalizing is the
  * first step of a canonicalization pipeline (compose with
  * `TextFunctions.canonicalize` / `Dedup.exactCanonical`).
  *
  * Forms: NFC (canonical composition — what DuckDB's nfc_normalize
  * mirrors, so NFC is the oracle-adjudicated tier) and NFKC
  * (compatibility composition: also folds width/ligature/super-script
  * variants — stronger dedup recall, JVM-only twin).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for ~all ASCII/already-NFC text, so the common case never pays
  * the compose pass. Real codegen — a CodegenFallback here would demote
  * every canonicalization projection out of whole-stage codegen.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"UnicodeNormalize: form must be NFC/NFD/NFKC/NFKD, got '$form'")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNormalize.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.UnicodeNormalize.normalize($s.toString(), "$form"));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Shared by eval and generated code. */
  def normalize(s: String, form: String): String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) s
    else java.text.Normalizer.normalize(s, f)
  }

  def nfc(c: Column): Column =
    GraftSqlBridge.column(UnicodeNormalize(GraftSqlBridge.expression(c), "NFC"))
  def nfkc(c: Column): Column =
    GraftSqlBridge.column(UnicodeNormalize(GraftSqlBridge.expression(c), "NFKC"))
}
