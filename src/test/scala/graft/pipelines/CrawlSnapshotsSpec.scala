package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrawlSnapshotsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "CrawlSnapshots.latestWins"

  it should "fold URL variants onto one canonical row with latest-wins and change detection" in {
    val fetches = Seq(
      // three fetches of one page: tracking-param/case/port variants,
      // content A, A, B — latest (ts 30) changed vs previous
      ("https://Site.Example.com/p?utm_source=x&a=1", 10L, "A"),
      ("https://site.example.com:443/p?a=1", 20L, "A"),
      ("HTTPS://site.example.com/p?a=1#frag", 30L, "B"),
      // single-fetch page: never "changed"
      ("http://other.org/q", 5L, "C"),
      // unparseable: dropped
      ("not a url", 1L, "Z")).toDF("url", "fetch_ts", "content")
    val out = CrawlSnapshots.latestWins(fetches)
      .select("canonical_url", "latest_ts", "n_fetches", "n_versions", "changed_last")
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    out shouldBe Set(
      ("https://site.example.com/p?a=1", 30L, 3L, 2L, true),
      ("http://other.org/q", 5L, 1L, 1L, false))
  }

  it should "not flag a change when the latest refetch repeats the previous content" in {
    val fetches = Seq(
      ("http://a/x", 1L, "old"),
      ("http://a/x", 2L, "new"),
      ("http://a/x", 3L, "new")).toDF("url", "fetch_ts", "content")
    CrawlSnapshots.latestWins(fetches)
      .select("latest_ts", "n_versions", "changed_last")
      .as[(Long, Long, Boolean)].head() shouldBe ((3L, 2L, false))
  }

  it should "break same-tick ties by content hash deterministically" in {
    // md5("a") = 0cc175…, md5("b") = 92eb5f… → "a" sorts first and wins
    // rank 1 under (ts DESC, hash ASC)
    val fetches = Seq(
      ("http://t/x", 7L, "a"),
      ("http://t/x", 7L, "b")).toDF("url", "fetch_ts", "content")
    val row = CrawlSnapshots.latestWins(fetches)
      .select("latest_hash", "changed_last").as[(String, Boolean)].head()
    row._1 shouldBe "0cc175b9c0f1b6a831c399e269772661"
    row._2 shouldBe true
  }

  it should "share one exchange between the window and the rollup" in {
    val fetches = Seq(("http://a/x", 1L, "c")).toDF("url", "fetch_ts", "content")
    val plan = CrawlSnapshots.latestWins(fetches).queryExecution.executedPlan.toString
    // one shuffle on the canonical key; payloads travel as md5 only
    plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    plan should not include "content#"
  }
}
