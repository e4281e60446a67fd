package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape locks for the round-7 funnel removals: every per-query /
  * per-keyword ranking whose window partition occupancy scaled with the
  * corpus now runs through the k-bounded combinable TopKAgg (an
  * ObjectHashAggregate) or a combinable groupBy — a regression back to
  * the corpus-occupancy window only shows up at scale, so it must fail
  * here first.
  */
class TopKPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  // strip AQE's "== Initial Plan ==" echo so node counts aren't doubled
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)

  private def windowCount(p: String): Int = "Window \\[".r.findAllIn(p).size

  private def windowLines(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("Window [")).toSeq

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.limit(3)

  "bruteForceKnn" should "rank through the bounded aggregator, not a per-query window" in {
    val p = plan(Ann.bruteForceKnn(emb, queries, k = 5))
    p should not include "Window"
    p should include ("ObjectHashAggregate")
  }

  "adcTopK" should "rank through the bounded aggregator, not a per-query window" in {
    val p = plan(Pq.adcTopK(emb, queries, dim = 64, m = 4, k = 16, topK = 5))
    p should include ("ObjectHashAggregate")
    // the only windows left are codebook seeding (k·m rows, ordered by
    // vec_id — bounded by construction); no window may rank the scored
    // similarity stream. Window nodes appear once per consuming subtree
    // in the printed tree, so assert on each line's CONTENT, not count.
    windowLines(p).foreach(l => l should not include "sim")
  }

  "ivfSearch" should "pre-aggregate per probed cell before the final bounded window" in {
    val cells = Ann.kmeansCells(emb, k = 4, iters = 1)
    val p = plan(Ann.ivfSearch(emb.join(cells, Seq("vec_id")), "cell", queries, k = 5))
    // the load-bearing node: top-k per (query, probed cell) BEFORE any
    // window — the remaining windows see nprobe routing rows and
    // <= nprobe·k survivors
    p should include ("ObjectHashAggregate(keys=[query_id")
  }

  "disambiguate" should "compute the corpus-wide keyword minimum as an agg, not a window" in {
    val df = Seq(
      ("p1", "c1", "DS", "kw1", 3L),
      ("p2", "c2", "DS", "kw1", 1L),
      ("p1", "c1", "DS", "kw2", 2L))
      .toDF("pmid", "pmcid", "type", "keywordId", "uniqueKeywordIdsPerLabelN")
    val p = plan(graft.etl.Grounding.disambiguate(df, "keywordId", "uniqueKeywordIdsPerLabelN"))
    // exactly the per-publication window survives; the (type, keyword)
    // window would funnel every occurrence of a corpus-hot keyword
    // through one task
    windowCount(p) shouldBe 1
  }
}
