package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the driver-generated testdata tables (repo TESTDATA.md).
  * One parquet per table under `dir`; schemas are self-describing and the
  * scans stay columnar so Catalyst pushes filters/projections into them.
  *
  * r10 (guide §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read"): each testdata table is ONE parquet file
  * with ONE row group, so the scan is a single task no matter the core
  * count — and every scan-stage operation above it (fixture-encode/decode
  * mapPartitions, shingle explodes, d²-amplified covariance products,
  * partial aggregates) inherited parallelism 1. Measured: v14's decimal
  * aggregation read as "5.9 s of decimal CPU" until the probe showed 2 000
  * input rows on one core. The round-robin repartition is CONDITIONAL on
  * the scan producing fewer splits than the session's parallelism, so at
  * production scale (many files/row groups) it is a no-op rather than an
  * added shuffle; the target derives from defaultParallelism, never a
  * constant, so the driver's lower-core PERF runs keep their shape. Row
  * order changes under round-robin — the Q determinism doctrine (order-
  * insensitive sums, sorted collected lists, total tiebreaks) is exactly
  * what makes that safe, and the DuckDB oracle re-verifies every query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memo of the "does this scan already split to >= target tasks?"
    * decision, keyed by (path, target). r11 (VERDICT r10 item 5): the
    * previous code ran `df.rdd.getNumPartitions` on EVERY table read —
    * a full physical-planning pass (and an RDD-conversion behavior pin)
    * per call, paid by each of a query's table reads on each bench rep.
    * Input files are immutable for the life of a run, and the split
    * count is a pure function of (files, maxPartitionBytes, target), so
    * the decision is computed once per (path, target) and reused.
    */
  private val splitDecision =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Boolean]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val target = spark.sparkContext.defaultParallelism
    val enough = splitDecision.computeIfAbsent((path, target),
      _ => df.rdd.getNumPartitions >= target)
    if (enough) df else df.repartition(target)
  }
}
