package graft.ann

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared sign-code kernel: one call computes all `bits` hyperplane sign
  * bits of a vector. Referenced by both the interpreted eval path and the
  * generated Java, so the two cannot diverge. Each plane is encoded as
  * packed terms `c > 0 ? d+1 : -(d+1)`; the accumulation is a left fold
  * of additions/subtractions in term order — the exact double sequence
  * the SQL oracle spells out, so results are bit-identical cross-engine.
  */
object HyperplaneKernel {
  /** Highest 1-based dimension index any plane term touches — computed
    * once per expression and checked per row: UnsafeArrayData.getDouble
    * past the end is an unchecked out-of-bounds read (silent garbage
    * codes), so an embedding shorter than the plane table must fail
    * loudly, matching the SQL oracle where element_at past the end is
    * NULL rather than noise.
    */
  def maxDim(planes: Array[Array[Int]]): Int = {
    var m = 0
    var p = 0
    while (p < planes.length) {
      val terms = planes(p)
      var i = 0
      while (i < terms.length) {
        val d = if (terms(i) > 0) terms(i) else -terms(i)
        if (d > m) m = d
        i += 1
      }
      p += 1
    }
    m
  }

  def code(arr: ArrayData, planes: Array[Array[Int]], maxDim: Int): Int = {
    if (arr.numElements() < maxDim)
      throw new IllegalArgumentException(
        s"hyperplane_code: embedding has ${arr.numElements()} elements but the " +
          s"plane table references dimension $maxDim; pass dim <= the real vector length")
    var bucket = 0
    var b = 0
    while (b < planes.length) {
      val terms = planes(b)
      var acc = 0.0
      var i = 0
      while (i < terms.length) {
        val t = terms(i)
        if (t > 0) acc += arr.getDouble(t - 1) else acc -= arr.getDouble(-t - 1)
        i += 1
      }
      if (acc > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Packed term table for (table, bits, dim), shared with the column
    * fold and the oracle SQL generator via Ann.hyperplaneTerms.
    */
  def planes(table: Int, bits: Int, dim: Int): Array[Array[Int]] =
    (0 until bits).map { b =>
      Ann.hyperplaneTerms(table, b, dim)
        .map { case (d, c) => if (c > 0) d + 1 else -(d + 1) }.toArray
    }.toArray
}

/** Native Catalyst expression for the multi-table LSH sign code. A
  * composed column fold (bits × terms `when`/`element_at` chain) code-gens
  * to thousands of lines per table and trips Janino's method limits,
  * dropping the whole stage to interpreted eval; this expression is one
  * kernel call over a referenced coefficient matrix — constant code size
  * regardless of bits × dim, stays inside WholeStageCodegen.
  */
case class HyperplaneCodeExpression(child: Expression, dim: Int, bits: Int, table: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_code requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_code"

  @transient private lazy val planes = HyperplaneKernel.planes(table, bits, dim)
  @transient private lazy val planesMaxDim = HyperplaneKernel.maxDim(planes)

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.code(input.asInstanceOf[ArrayData], planes, planesMaxDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ann.HyperplaneKernel$$.MODULE$$.code($c, $planesRef, $planesMaxDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodeExpression =
    copy(child = newChild)
}

object HyperplaneCodeExpression {
  /** Column-level entry point; `embedding` must be array<double>. */
  def apply(embedding: Column, dim: Int, bits: Int, table: Int): Column =
    GraftSqlBridge.column(
      new HyperplaneCodeExpression(GraftSqlBridge.expression(embedding), dim, bits, table))
}
