package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Event

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // offset off epoch 0: a row timestamped exactly at the initial
  // watermark (0) is treated as late and dropped
  private def ts(minutes: Long): Timestamp = new Timestamp(86400000L + minutes * 60000L)

  private def runBatches[T](events: Seq[Seq[Event]])(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = build(input.toDF())
      .writeStream.format("memory").queryName("out").outputMode("append").start()
    events.foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table("out")
  }

  "hourlyAgg" should "emit closed windows and drop late data past the watermark" in {
    val out = runBatches(Seq(
      Seq(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0)),
      // advance event time far enough to close the first hour window
      Seq(Event(3, ts(200), 1, "click", 4.0)),
      // a very late event for the already-closed window: dropped
      Seq(Event(4, ts(15), 1, "click", 8.0)),
      Seq(Event(5, ts(400), 1, "click", 16.0))))(EventStreams.hourlyAgg)

    val rows = out.select(col("hour"), col("n"), col("total_value"))
      .as[(Timestamp, Long, Double)].collect().toSet
    rows should contain((ts(0), 2L, 3.0)) // late event 4 NOT counted
  }

  "hoppingAgg" should "count each event in its 4 hopping windows" in {
    val out = runBatches(Seq(
      Seq(Event(1, ts(10), 1, "click", 1.0)),
      // advance event time past the watermark so ts(10)'s windows close
      Seq(Event(2, ts(400), 1, "click", 2.0))))(EventStreams.hoppingAgg)

    val rows = out.select(col("wstart"), col("n"), col("total_value"))
      .as[(Timestamp, Long, Double)].collect().toSet
    // ts(10) = minute 10 → slide slot 0 (0:00) is the only slot in
    // 0:00..0:10; member windows start at −0:45, −0:30, −0:15, 0:00
    rows should contain allOf(
      (ts(-45), 1L, 1.0), (ts(-30), 1L, 1.0), (ts(-15), 1L, 1.0), (ts(0), 1L, 1.0))
  }

  "rollingZscore" should "emit bit-identical scores to the batch twin for in-order batches" in {
    implicit val sqlCtx = spark.sqlContext
    // 2 users × 30 interleaved events, deterministic wiggly values
    val evs = (0 until 60).map { i =>
      Event(i.toLong, ts(i.toLong), i % 2,
        if (i % 3 == 0) "click" else "view", math.sin(i * 0.7) * 10 + i % 7)
    }
    // batch twin: write the same rows as an events table and run q:e18
    val dir = java.nio.file.Files.createTempDirectory("zscore-events").toString
    evs.toDF().withColumn("props", lit("""{"k":1}"""))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.EventQueries.rollingZscore.run(spark, dir)
      .select(col("event_id"), col("z")).as[(Long, Option[Double])]
      .collect().toMap

    val input = MemoryStream[Event]
    val q = EventStreams.rollingZscore(input.toDS(), spark)
      .writeStream.format("memory").queryName("zscores").outputMode("append").start()
    evs.grouped(20).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("zscores")
      .select(col("event_id"), col("z")).as[(Long, Option[Double])]
      .collect().toMap

    streamed.size shouldBe 60
    streamed shouldBe batch
    // sanity: scores actually exist once a user has ≥2 prior events
    streamed.values.count(_.isDefined) should be > 50
  }

  "sessionize (flatMapGroupsWithState)" should "close sessions on gap and emit summaries" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), spark)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()

    // user 1: two events 10 min apart (one session), then 40-min gap (new session)
    input.addData(Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(50), 1, "click", 4.0)))
    q.processAllAvailable()
    // push watermark forward so the second session times out too
    input.addData(Seq(Event(9, ts(1000), 2, "click", 0.5)))
    q.processAllAvailable()
    input.addData(Seq(Event(10, ts(2000), 2, "click", 0.5)))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions")
      .filter(col("user_id") === 1)
      .select("session_start", "n_events", "total_value")
      .as[(Timestamp, Int, Double)].collect().toSet
    sessions shouldBe Set((ts(0), 2, 3.0), (ts(50), 1, 4.0))
  }

  "dedup" should "drop duplicate event ids within the watermark" in {
    val out = runBatches(Seq(
      Seq(Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0)),
      Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "view", 2.0))))(
      EventStreams.dedup)
    out.count() shouldBe 2
  }

  "sessionWindows" should "aggregate with the built-in session window" in {
    val out = runBatches(Seq(
      Seq(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 2.0)),
      Seq(Event(3, ts(500), 7, "click", 4.0)),
      Seq(Event(4, ts(1500), 7, "click", 8.0))))(EventStreams.sessionWindows)
    val rows = out.select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    rows should contain((7L, 2L, 3.0))
  }

  "errorClickJoin" should "join each error to same-user clicks in the prior 60s only" in {
    implicit val sqlCtx = spark.sqlContext
    def s(seconds: Long): Timestamp = new Timestamp(86400000L + seconds * 1000L)
    val errIn = MemoryStream[Event]
    val clickIn = MemoryStream[Event]
    val q = EventStreams.errorClickJoin(errIn.toDF(), clickIn.toDF())
      .writeStream.format("memory").queryName("joined").outputMode("append").start()

    clickIn.addData(Seq(
      Event(10, s(0), 1, "click", 1.0),    // 100s before the error: outside
      Event(11, s(70), 1, "click", 1.0),   // 30s before: inside
      Event(12, s(100), 1, "click", 1.0),  // exactly at the error: inside
      Event(13, s(95), 2, "click", 1.0)))  // other user: excluded
    errIn.addData(Seq(Event(1, s(100), 1, "error", 0.0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("joined")
      .select(col("error_id"), col("click_ts")).as[(Long, Timestamp)].collect().toSet
    rows shouldBe Set((1L, s(70)), (1L, s(100)))
  }
}
