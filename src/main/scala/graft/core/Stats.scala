package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics without a global sort.
  *
  * Spark's exact `percentile` aggregate collects every value of a group
  * into one reducer and sorts it — at 100 TB that is a single-task sort
  * of the corpus. `approx_percentile` scales but is approximate. For the
  * integer-valued metrics quality pipelines actually rank on (token
  * counts, char lengths, scores bucketed to fixed precision), exactness
  * and scale coexist via rank selection over the VALUE HISTOGRAM:
  *
  *   1. `groupBy(value).count()` — one map-side-combinable shuffle whose
  *      output is bounded by the metric's value cardinality, not the row
  *      count (a length metric has ~10^4 distinct values at any corpus
  *      size);
  *   2. a running-count window over the histogram — a single-partition
  *      sort of the HISTOGRAM, thousands of rows, deliberately not the
  *      corpus (the one `Window.orderBy` without a partition key in this
  *      library, safe because its input is the bounded histogram);
  *   3. each requested quantile q selects the smallest value whose
  *      cumulative count reaches `ceil(q·N)` — the inverse-CDF / lower
  *      discrete quantile, replayed relationally by the oracle with the
  *      identical arithmetic (q·N is the same IEEE product on both
  *      engines, so the rank boundary cannot disagree).
  *
  * For unbounded-cardinality double metrics, quantize to fixed precision
  * first (the histogram bound is then the quantization grid); exactness
  * holds at that precision.
  */
object Stats {

  /** Exact discrete quantiles of an integral column.
    *
    * Returns one row per requested quantile: (q double, value long) where
    * `value` is the smallest v with |{x ≤ v}| ≥ ceil(q·N).
    */
  def exactQuantiles(df: DataFrame, value: Column, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val hist = df.groupBy(value.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = df.agg(count(lit(1)).as("n"))
    cum.crossJoin(broadcast(total))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q"))
      .agg(min(col("v")).as("value"))
  }
}
