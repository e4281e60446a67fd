package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared stemming kernel: one call stems a whole token array. Referenced
  * by both the interpreted eval path and the generated Java (Janino calls
  * it as a static-object method), so the two paths cannot diverge.
  */
object PorterStemmerKernel {
  def stemAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = UTF8String.fromString(PorterStemmer.stem(arr.getUTF8String(i).toString))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for array-wise Porter stemming — the
  * codegen'd replacement for the Scala UDF variant (SURVEY.md §7 optional
  * item: "stemmer as codegen Expression if profiling demands").
  *
  * Compared to a UDF, this stays inside WholeStageCodegen: no
  * Catalyst↔Scala converter allocation per row, no Option boxing, null
  * handling fused into the generated code. The stemming itself is the
  * same shared kernel. In the grounding pipeline this expression only
  * ever runs over the distinct label vocabulary, but a user applying it
  * to a 100 TB token stream gets the per-row overhead removed.
  */
case class StemArrayExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"porter_stem requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "porter_stem"

  override def nullSafeEval(input: Any): Any =
    PorterStemmerKernel.stemAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.PorterStemmerKernel$$.MODULE$$.stemAll($c);")

  override protected def withNewChildInternal(newChild: Expression): StemArrayExpression =
    copy(child = newChild)
}

object StemArrayExpression {
  /** Column-level entry point. */
  def apply(tokens: Column): Column =
    GraftSqlBridge.column(new StemArrayExpression(GraftSqlBridge.expression(tokens)))
}
