package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built entirely from Spark's
  * codegen'd higher-order functions — no UDFs.
  *
  * The reference implements cosine similarity as a Scala UDF over ML
  * vectors (reference spark/Helpers.scala:82–92) and the L2 norm as a UDF
  * (reference Vectors.scala:33). Expression-level variants keep the whole
  * computation inside WholeStageCodegen and serialization-free, which is
  * what we want when scoring billions of embedding pairs.
  */
object VectorOps {

  /** Cast any numeric array (e.g. `array<float>` from parquet) to
    * `array<double>` so downstream folds are double-precision.
    */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product via zip_with + left fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Sum of squares, left fold. */
  def sumSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(sumSq(a))

  /** Euclidean distance, left fold over zipped squared differences
    * (DuckDB's list_distance computes the same value, so argmin
    * comparisons replay cross-engine).
    */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))

  /** Cosine similarity with the reference's zero-denominator guard
    * (reference spark/Helpers.scala:86–88 returns 0 when either norm is 0).
    */
  def cosine(a: Column, b: Column): Column = {
    val den = l2Norm(a) * l2Norm(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }
}
