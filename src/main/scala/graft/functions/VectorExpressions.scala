package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the vector folds in [[VectorOps]]
  * (optimization guide §4: eliminate non-codegen expressions in the hot
  * path).
  *
  * The previous forms were built from `zip_with` + `aggregate`: Spark's
  * higher-order functions are NOT whole-stage-codegen'd — each element
  * evaluates the lambda through the interpreted path with a boxed
  * LambdaVariable per step, so a 64-dim cosine costs ~192 interpreted
  * lambda invocations per PAIR. On pair-scoring operators that is the
  * entire profile (d11 scores ~48M in-cell pairs at sf0.1).
  *
  * Each kernel is one tight primitive-double loop over the UnsafeArrayData,
  * shared verbatim by the interpreted eval and the generated Java (the
  * HyperplaneKernel pattern), accumulating IN THE SAME ORDER as the old
  * left folds — so every result is bit-identical:
  *   - dot:    acc ← acc + a(i)·b(i), i ascending, acc₀ = 0.0
  *   - sumSq:  acc ← acc + a(i)²
  *   - l2Dist: sqrt(acc ← acc + (a(i)−b(i))²)
  *   - cosine: den = sqrt(sumSq(a))·sqrt(sumSq(b)); den == 0 → 0.0,
  *             otherwise dot/den (the reference's zero guard)
  * Null semantics replicate the HOF forms exactly: a null ELEMENT poisons
  * the fold to null; `zip_with` pads mismatched lengths with nulls, so a
  * length mismatch is null too; cosine's `when(den === 0, 0)` fires even
  * when the dot side would be null (mismatched lengths with a zero-norm
  * side → 0.0), which the kernel reproduces by checking den first.
  */
object VectorKernel {

  /** Sum of a(i)·b(i); null on length mismatch or any null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Sum of a(i)²; null on any null element. */
  def sumSq(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i) * a.getDouble(i)
      i += 1
    }
    acc
  }

  /** sqrt of the summed squared differences; null like [[dot]]. */
  def l2Dist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Cosine with the zero-denominator guard. The den == 0 check runs
    * BEFORE the dot null check — `when(den === 0, 0).otherwise(dot/den)`
    * short-circuits the same way.
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val sa = sumSq(a)
    if (sa == null) return null
    val sb = sumSq(b)
    if (sb == null) return null
    val den = math.sqrt(sa.doubleValue()) * math.sqrt(sb.doubleValue())
    if (den == 0.0) return java.lang.Double.valueOf(0.0)
    val d = dot(a, b)
    if (d == null) return null
    java.lang.Double.valueOf(d.doubleValue() / den)
  }
}

private[functions] trait VectorExprHelpers { self: Expression =>
  protected def checkArr(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<double>, got ${other.catalogString}")
  }
  // the kernels return null on null elements / length mismatches even
  // when the input columns themselves are non-null
  override def nullable: Boolean = true
}

abstract class BinaryVectorExpression extends BinaryExpression with VectorExprHelpers {
  protected def kernelName: String
  protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArr(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkArr(right.dataType, prettyName)
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ca, cb) => {
      val r = ctx.freshName("r")
      s"""java.lang.Double $r = graft.functions.VectorKernel$$.MODULE$$.$kernelName($ca, $cb);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
}

case class DotExpression(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"
  override protected def kernelName: String = "dot"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpression =
    copy(left = l, right = r)
}

case class CosineExpression(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_cosine"
  override protected def kernelName: String = "cosine"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpression =
    copy(left = l, right = r)
}

case class L2DistExpression(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_l2dist"
  override protected def kernelName: String = "l2Dist"
  override protected def kernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernel.l2Dist(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistExpression =
    copy(left = l, right = r)
}

case class SumSqExpression(child: Expression)
    extends UnaryExpression with VectorExprHelpers {
  override def prettyName: String = "vec_sumsq"
  override def checkInputDataTypes(): TypeCheckResult =
    checkArr(child.dataType, prettyName)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any =
    VectorKernel.sumSq(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ca => {
      val r = ctx.freshName("r")
      s"""java.lang.Double $r = graft.functions.VectorKernel$$.MODULE$$.sumSq($ca);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SumSqExpression =
    copy(child = newChild)
}

/** Flat upper-triangle product stream for the covariance kernel
  * (Pca.covariance): element k of the output is x(i)·x(j) for the k-th
  * (i ≤ j < dim) pair in row-major order — exactly the old
  * `flatten(transform(sequence(0, dim−1), i => transform(sequence(i,
  * dim−1), j => element_at(x, i+1) * element_at(x, j+1))))`, which built
  * d(d+1)/2 products per row through interpreted lambda machinery.
  * `element_at` past the end of a short array is null, and a null input
  * element poisons its products to null — both replicated.
  */
case class TriangleProductsExpression(child: Expression, dim: Int)
    extends UnaryExpression with VectorExprHelpers {
  require(dim > 0, "dim must be positive")
  override def prettyName: String = "vec_triangle_products"
  override def checkInputDataTypes(): TypeCheckResult =
    checkArr(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullSafeEval(a: Any): Any =
    TriangleProductsExpression.kernel(a.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ca =>
      s"${ev.value} = graft.functions.TriangleProductsExpression$$.MODULE$$.kernel($ca, $dim);")
  override protected def withNewChildInternal(newChild: Expression): TriangleProductsExpression =
    copy(child = newChild)
}

object TriangleProductsExpression {
  def kernel(arr: ArrayData, dim: Int): ArrayData = {
    val n = arr.numElements()
    // hoist the element reads: value i is reused across its dim − i pairs
    val xs = new Array[Double](dim)
    val ok = new Array[Boolean](dim)
    var anyNull = false
    var i = 0
    while (i < dim) {
      if (i < n && !arr.isNullAt(i)) { xs(i) = arr.getDouble(i); ok(i) = true }
      else anyNull = true
      i += 1
    }
    if (!anyNull) {
      // fast path: primitive output, no boxing
      val out = new Array[Double](dim * (dim + 1) / 2)
      var k = 0
      i = 0
      while (i < dim) {
        val xi = xs(i)
        var j = i
        while (j < dim) { out(k) = xi * xs(j); k += 1; j += 1 }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](dim * (dim + 1) / 2)
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          out(k) = if (ok(i) && ok(j)) java.lang.Double.valueOf(xs(i) * xs(j)) else null
          k += 1
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def l2Dist(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2DistExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def sumSq(a: Column): Column =
    GraftSqlBridge.column(SumSqExpression(GraftSqlBridge.expression(a)))
  def triangleProducts(a: Column, dim: Int): Column =
    GraftSqlBridge.column(TriangleProductsExpression(GraftSqlBridge.expression(a), dim))
}
