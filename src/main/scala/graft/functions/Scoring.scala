package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Harmonic-sum relevance kernels.
  *
  * The reference defines three variants of `Σ_k v_k / k²` over a collected
  * score list (reference spark/Helpers.scala:98–103 sorts descending — the
  * canonical `harmonicFn`; reference Processing.scala:21–26 is the unsorted
  * variant whose input is already rank-ordered; Processing.scala:14–19 is a
  * dead normalized variant). All are pure higher-order-function expressions,
  * so they stay in codegen and need no UDF/UDAF.
  */
object Scoring {

  private def harmonicOver(sorted: Column): Column =
    when(size(sorted) === 0, lit(0.0)).otherwise(
      aggregate(
        zip_with(sorted, sequence(lit(1), size(sorted)), (v, k) => v / pow(k, lit(2))),
        lit(0.0),
        _ + _))

  /** Canonical harmonic score: values sorted descending, then Σ v_k/k².
    * Mirrors reference spark/Helpers.scala:98–103.
    */
  def harmonicSorted(values: Column): Column =
    harmonicOver(sort_array(values, asc = false))

  /** Unsorted harmonic: caller guarantees rank order
    * (reference Processing.scala:21–26).
    */
  def harmonic(values: Column): Column = harmonicOver(values)
}
