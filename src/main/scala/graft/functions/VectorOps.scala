package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns — native codegen Catalyst
  * kernels (graft.functions.VectorKernel), no UDFs.
  *
  * The reference implements cosine similarity as a Scala UDF over ML
  * vectors (reference spark/Helpers.scala:82–92) and the L2 norm as a UDF
  * (reference Vectors.scala:33). Round 1–9 used `zip_with`/`aggregate`
  * column folds; those higher-order functions are NOT whole-stage-
  * codegen'd (each element runs the lambda interpreted with a boxed
  * LambdaVariable), which dominated the pair-scoring profiles — see
  * VectorExpressions.scala for the measured replacement. Results are
  * bit-identical: same accumulation order, same null semantics
  * (VectorExpressionsSpec locks equality against the old folds).
  */
object VectorOps {

  /** Cast any numeric array (e.g. `array<float>` from parquet) to
    * `array<double>` so downstream folds are double-precision.
    */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product, left fold order (deterministic). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Sum of squares, left fold. */
  def sumSq(a: Column): Column = VectorExpressions.sumSq(a)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(sumSq(a))

  /** Euclidean distance over summed squared differences (DuckDB's
    * list_distance computes the same value, so argmin comparisons replay
    * cross-engine).
    */
  def l2Dist(a: Column, b: Column): Column = VectorExpressions.l2Dist(a, b)

  /** Cosine similarity with the reference's zero-denominator guard
    * (reference spark/Helpers.scala:86–88 returns 0 when either norm is 0).
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)
}
