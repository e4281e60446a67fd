package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class QuotaSpec extends SparkSpec {
  import spark.implicits._

  "Quota.enforce (transformWithState)" should
      "admit per-source documents until the token cap, across micro-batches" in {
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[QuotaDoc]
      val q = Quota.enforce(input.toDS(), cap = 100L)
        .writeStream.format("memory").queryName("quota").outputMode("append")
        .start()

      // batch 1: source a spends 40 + 50 = 90; source b spends 80
      input.addData(Seq(
        QuotaDoc("a", 1L, 40L), QuotaDoc("a", 2L, 50L), QuotaDoc("b", 3L, 80L)))
      q.processAllAvailable()
      // batch 2: a has 10 left — doc 4 (20) rejected, doc 5 (10) admitted
      // (decisions are doc_id-ordered within the batch); b's doc 6 (30)
      // rejected — state carried across batches
      input.addData(Seq(
        QuotaDoc("a", 4L, 20L), QuotaDoc("a", 5L, 10L), QuotaDoc("b", 6L, 30L)))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("quota")
        .select("doc_id", "admitted", "cum_tokens")
        .as[(Long, Boolean, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      got shouldBe Map(
        1L -> ((true, 40L)), 2L -> ((true, 90L)), 3L -> ((true, 80L)),
        4L -> ((false, 90L)), 5L -> ((true, 100L)), 6L -> ((false, 80L)))
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
