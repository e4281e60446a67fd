package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared normalization kernel — referenced by both the interpreted eval
  * path and the generated Java (the [[PorterStemmerKernel]] discipline:
  * one kernel, two callers, zero divergence). `Normalizer.isNormalized`
  * is checked first so the already-normal fast path (the overwhelming
  * majority of crawl text) allocates nothing.
  */
object UnicodeNormalizeKernel {
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Native Catalyst expression for Unicode normalization (NFC / NFD /
  * NFKC / NFKD via `java.text.Normalizer`) — Spark has no builtin for
  * this, and a dedup or exact-match pipeline that hashes raw crawl text
  * treats `café` (precomposed) and `café` (combining mark) as different
  * documents unless keys are normalized first. As an expression rather
  * than a UDF it stays inside WholeStageCodegen: null handling fused,
  * no converter allocation per row, and the isNormalized fast path
  * returns the input UTF8String unchanged (no copy) for ASCII-clean
  * rows — the 100 TB posture, since real corpora are overwhelmingly
  * already in NFC.
  */
case class UnicodeNormalizeExpression(child: Expression, form: String)
    extends UnaryExpression {

  // resolved once per expression; an invalid form fails analysis, not
  // execution
  @transient private lazy val formObj = java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if Set("NFC", "NFD", "NFKC", "NFKD")(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $form")
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeKernel.normalize(input.asInstanceOf[UTF8String], formObj)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.UnicodeNormalizeKernel$$.MODULE$$.normalize(
         |  $c, java.text.Normalizer.Form.$form);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpression =
    copy(child = newChild)
}

object UnicodeNormalizeExpression {
  /** Column-level entry point: `unicodeNormalize($"text", "NFKC")`. */
  def apply(text: Column, form: String): Column =
    GraftSqlBridge.column(
      new UnicodeNormalizeExpression(GraftSqlBridge.expression(text), form))
}
