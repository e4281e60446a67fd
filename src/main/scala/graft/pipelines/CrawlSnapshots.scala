package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-snapshot URL-level dedup — the corpus-versioning primitive for
  * recurring crawls: many fetches of the same page (URL variants, revisit
  * rounds) collapse to one row per CANONICAL URL carrying the latest
  * fetch, revisit statistics, and a changed-since-previous flag, so a
  * training-data refresh can keep `changed_last` rows only instead of
  * re-processing the whole snapshot.
  */
object CrawlSnapshots {

  /** Latest-crawl-wins per canonical URL ([[graft.text.UrlOps
    * .canonicalizeUrl]] folds case/default-port/tracking-param/fragment
    * variants together; unparseable URLs are dropped). Content equality
    * travels as md5 — payloads never shuffle. Deterministic total order:
    * (fetch_ts DESC, content_md5 ASC), so two fetches in the same tick
    * resolve identically on both engines.
    *
    * Output: (canonical_url, latest_ts, latest_hash, n_fetches,
    * n_versions, changed_last) — changed_last is true iff a previous
    * fetch exists and its content hash differs from the latest's.
    *
    * Scale shape: one shuffle on the canonical URL; the row_number
    * window and the rollup share that partitioning (no second
    * exchange), and window occupancy is one URL's revisit count —
    * crawl-policy-bounded, never corpus-shaped.
    *
    * Measured AQE note (SCALE.md "Round-9 operator growth probes"): the
    * shuffled rows are ~60-byte (canonical, ts, md5) tuples but
    * CPU-heavy per row, so at 10M fetches the default 64 MB advisory
    * coalesced the window stage into a few fat tasks — 3.8× wall, 4.7×
    * CPU worse than `advisoryPartitionSizeInBytes=8m`. This frame is
    * LAZY, so the library cannot scope that conf the way the eager
    * graph rounds do ([[graft.core.AqeHints]]); instead the window's
    * exchange is declared with an EXPLICIT partition count
    * (`repartition(n, canonical_url)` — a REPARTITION_BY_NUM shuffle,
    * which AQE's coalescing rule leaves alone by contract), sized from
    * the session's `spark.sql.shuffle.partitions`. Same single
    * exchange, shared by the window and the rollup; no caller conf, no
    * eager materialization (measured at 10M in SCALE.md round-10).
    */
  def latestWins(fetches: DataFrame, urlCol: String = "url",
      tsCol: String = "fetch_ts", contentCol: String = "content"): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
      .orderBy(col("ts").desc, col("h"))
    val parts = fetches.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    fetches
      .select(
        graft.text.UrlOps.canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(tsCol).cast("long").as("ts"),
        md5(col(contentCol)).as("h"))
      .filter(col("canonical_url").isNotNull)
      .repartition(parts, col("canonical_url"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("canonical_url"))
      .agg(
        max(when(col("rn") === 1, col("ts"))).as("latest_ts"),
        max(when(col("rn") === 1, col("h"))).as("latest_hash"),
        max(when(col("rn") === 2, col("h"))).as("prev_hash"),
        count(lit(1)).as("n_fetches"),
        count_distinct(col("h")).as("n_versions"))
      .select(col("canonical_url"), col("latest_ts"), col("latest_hash"),
        col("n_fetches"), col("n_versions"),
        (col("prev_hash").isNotNull && col("prev_hash") =!= col("latest_hash"))
          .as("changed_last"))
  }
}
