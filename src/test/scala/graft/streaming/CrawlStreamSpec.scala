package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CrawlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  "CrawlStream.latestWins" should
      "emit new/changed/unchanged/stale across micro-batches under the batch total order" in withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CrawlFetch]
    val q = CrawlStream.latestWins(input.toDS())
      .writeStream.format("memory").queryName("crawl").outputMode("append")
      .start()

    val hA = "aaaa"; val hB = "bbbb"; val hC = "cccc"
    // batch 1: first sight, then an in-batch refresh with new content
    input.addData(Seq(
      CrawlFetch("u1", 10L, hA), CrawlFetch("u1", 20L, hB),
      CrawlFetch("u2", 5L, hC)))
    q.processAllAvailable()
    // batch 2: same content refresh (unchanged), late fetch (stale),
    // and a same-tick tie that LOSES on hash order (hB < hC is false
    // — "cccc" > "bbbb", so the tie keeps the standing hB)
    input.addData(Seq(
      CrawlFetch("u1", 30L, hB), CrawlFetch("u1", 15L, hA),
      CrawlFetch("u2", 5L, hA)))
    q.processAllAvailable()
    // batch 3: cross-batch tie that LOSES on hash order — state is
    // (5, hA) from batch 2, and a ts-5 hC fetch loses the tie (hC > hA)
    input.addData(Seq(CrawlFetch("u2", 5L, hC)))
    q.processAllAvailable()
    // batch 4: strictly newer ts beats the standing fetch regardless of
    // hash order (hC > hA but ts 6 > 5): changed
    input.addData(Seq(CrawlFetch("u2", 6L, hC)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("crawl")
      .select("canonical_url", "fetch_ts", "status")
      .as[(String, Long, String)].collect().toSet
    got shouldBe Set(
      ("u1", 10L, "new"), ("u1", 20L, "changed"),
      ("u2", 5L, "new"),
      ("u1", 30L, "unchanged"), ("u1", 15L, "stale"),
      ("u2", 5L, "changed"),   // same tick, hA < hC: wins and differs
      ("u2", 5L, "stale"),     // batch 3: same tick, hC > hA: loses
      ("u2", 6L, "changed"))
  }

  it should "agree with the batch latestWins over the concatenated fetches" in withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val raw = Seq(
      ("https://Site.Example.com/p?utm_source=x&a=1", 10L, "A"),
      ("https://site.example.com:443/p?a=1", 20L, "A"),
      ("HTTPS://site.example.com/p?a=1#frag", 30L, "B"),
      ("http://other.org/q", 5L, "C"),
      ("not a url", 1L, "Z")).toDF("url", "fetch_ts", "content")
    val fetches = CrawlStream.fromRaw(raw).collect().toSeq

    val input = MemoryStream[CrawlFetch]
    val q = CrawlStream.latestWins(input.toDS())
      .writeStream.format("memory").queryName("crawl2").outputMode("append")
      .start()
    fetches.foreach { f => input.addData(Seq(f)); q.processAllAvailable() }
    q.stop()

    // the stream's surviving (non-stale) frontier per URL = the batch
    // path's latest row
    val streamLatest = spark.table("crawl2")
      .filter(col("status") =!= "stale")
      .groupBy(col("canonical_url"))
      .agg(max(struct(col("fetch_ts"), col("content_hash"))).as("s"))
      .select(col("canonical_url"), col("s.fetch_ts").as("latest_ts"),
        col("s.content_hash").as("latest_hash"))
      .as[(String, Long, String)].collect().toSet
    val batch = graft.pipelines.CrawlSnapshots.latestWins(raw)
      .select("canonical_url", "latest_ts", "latest_hash")
      .as[(String, Long, String)].collect().toSet
    streamLatest shouldBe batch
  }
}
