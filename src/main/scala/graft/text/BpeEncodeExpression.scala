package graft.text

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for whole-text BPE encoding: splits on
  * whitespace, greedily merges each word by rank, returns the flattened
  * subword token array. Stays inside WholeStageCodegen — the generated
  * code calls the kernel through a plan reference object, so there is no
  * per-row converter allocation and no UDF boxing, and the ranked merge
  * table is materialized once per task rather than per row.
  */
case class BpeEncodeExpression(child: Expression, merges: Seq[(String, String)],
    eow: String) extends UnaryExpression {

  @transient private lazy val kernel = new BpeKernel(merges, eow)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    kernel.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernelRef = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernelRef.encodeText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpression =
    copy(child = newChild)
}

object BpeEncodeExpression {
  def apply(text: Column, merges: Seq[(String, String)], eow: String): Column =
    GraftSqlBridge.column(
      new BpeEncodeExpression(GraftSqlBridge.expression(text), merges, eow))
}
