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

  /** Per-group exact discrete quantiles — [[exactQuantiles]] with a
    * grouping key (the per-language / per-source quality-cutoff
    * primitive: "p90 document length per language" drives per-stratum
    * filtering thresholds). Same histogram rank selection; the
    * cumulative window partitions by GROUP over the per-group value
    * histogram, so its occupancy is the group's value cardinality, never
    * its row count — no group funnels regardless of stratum skew.
    *
    * Returns one row per (group, q): (groupCol, q, value).
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, value: Column,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val hist = df.groupBy(col(groupCol), value.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    cum.join(totals, Seq(groupCol))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col(groupCol), col("q"))
      .agg(min(col("v")).as("value"))
  }

  /** Approximate quantiles (Greenwald–Khanna sketch, the 100 TB path —
    * one pass, mergeable partials, no histogram-cardinality assumption)
    * CHECKED in-plan against the exact histogram: for each q the sketch
    * value's true rank window must overlap the target rank ±N/accuracy
    * (the GK guarantee), emitted as a boolean beside the exact value.
    * The a13 discipline: sketch internals differ across engines so the
    * raw estimate has no cross-engine oracle, but the accuracy CLAIM is
    * relational — DuckDB replays the exact quantiles and expects TRUE,
    * so a sketch straying past its guarantee hash-mismatches.
    *
    * Returns (q, exact_value, within_bound). The exact side shares the
    * sketch side's scan; the histogram window is bounded by value
    * cardinality as in [[exactQuantiles]].
    */
  def approxQuantilesChecked(df: DataFrame, value: Column, qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val v = value.cast("long")
    val hist = df.groupBy(v.as("v")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum_le",
      sum(col("c")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = df.agg(count(lit(1)).as("n"))
    val exact = cum.crossJoin(broadcast(total))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("cum_le") >= ceil(col("q") * col("n")))
      .groupBy(col("q"))
      .agg(min(col("v")).as("exact_value"))
    // the sketch returns an ELEMENT of the data, so an exact histogram
    // row always matches it; its rank window is [cum_le - c + 1, cum_le]
    val approx = df
      .agg(percentile_approx(v, array(qs.map(lit): _*), lit(accuracy)).as("ap"))
      .select(posexplode(col("ap")).as(Seq("i", "approx_v")))
      .select(element_at(array(qs.map(lit): _*), col("i") + 1).as("q"), col("approx_v"))
    val slack = col("n").cast("double") / accuracy + 1.0
    val within = (col("cum_le") - col("c")).cast("double") <= col("q") * col("n") + slack &&
      col("cum_le").cast("double") >= col("q") * col("n") - slack
    approx
      .join(cum, col("approx_v") === col("v"))
      .crossJoin(broadcast(total))
      .select(col("q"), within.as("within_bound"))
      .join(exact, Seq("q"))
      .select(col("q"), col("exact_value"), col("within_bound"))
  }
}
