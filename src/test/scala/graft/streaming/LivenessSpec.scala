package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class LivenessSpec extends SparkSpec {
  import spark.implicits._

  // offset off epoch zero: the query's INITIAL watermark is 0, and a row
  // at event time 0 is judged late against it and dropped before the
  // processor ever sees it
  private def ts(minutes: Long): Timestamp = new Timestamp((60 + minutes) * 60000L)

  "Liveness.silenceAlerts (event-time timers)" should
      "alert exactly once for sources that go silent past the gap" in {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SourceEvent]
      val events = input.toDS().withWatermark("ts", "0 seconds").as[SourceEvent]
      val q = Liveness.silenceAlerts(events, gapMs = 10 * 60000L)
        .writeStream.format("memory").queryName("alerts").outputMode("append")
        .start()

      // a delivers at t0 and t5 (stays live); b delivers only at t0
      input.addData(Seq(SourceEvent("a", ts(0)), SourceEvent("b", ts(0))))
      q.processAllAvailable()
      input.addData(Seq(SourceEvent("a", ts(5))))
      q.processAllAvailable()
      // watermark to t30: b's t0+10 timer fires (silent); a's superseded
      // t0+10 timer must be swallowed by the expiry guard, and its live
      // t5+10 timer fires too — a went silent after t5 as well
      input.addData(Seq(SourceEvent("c", ts(30))))
      q.processAllAvailable()
      // one more watermark advance: timers expire against the watermark
      // computed from PRIOR batches, so the t30 batch raises it and this
      // batch fires the expired timers
      input.addData(Seq(SourceEvent("c", ts(31))))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("alerts")
        .select("source", "last_seen").as[(String, Timestamp)].collect().toSet
      got shouldBe Set(("a", ts(5)), ("b", ts(0)))
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
