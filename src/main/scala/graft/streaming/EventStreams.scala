package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the event stream (batch twins live in
  * graft.queries.EventQueries — same window/session semantics, verified
  * against the DuckDB oracle there; these are the incremental versions).
  *
  * The reference is batch-only (SURVEY.md §2.10) — this is a
  * beyond-parity capability: the same aggregations a 100 TB/day event
  * pipeline needs, expressed with watermarks so state is bounded and late
  * data has defined semantics.
  */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

final case class SessionSummary(user_id: Long, session_start: Timestamp,
    n_events: Int, total_value: Double)

/** Open-session accumulator for flatMapGroupsWithState (top-level: nested
  * case classes break Janino encoder codegen).
  */
final case class SessionState(start: Long, lastSeen: Long, n: Int, total: Double)

final case class ScoredEvent(event_id: Long, user_id: Long, value: Double,
    z: Option[Double])

/** Per-user ring of the last ≤10 values for the streaming z-score —
  * state is O(frame), independent of stream length.
  */
final case class ZScoreState(values: List[Double])

object EventStreams {

  /** Tumbling 1-hour per-type counts/sums with a 2-hour watermark: late
    * events beyond the watermark are dropped deterministically; state per
    * open window only.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Hopping 1-hour windows advancing every 15 minutes, 2-hour
    * watermark — each event lands in exactly 4 open windows (bounded
    * explode before the stateful agg, so state is per open window ×
    * type, never per event). Batch twin: q:e16_hopping_agg.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total_value"))

  /** Built-in session windows: 30-minute inactivity gap, watermark-bounded
    * state — the declarative path, preferred when per-session output is a
    * plain aggregate.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Custom sessionization via flatMapGroupsWithState — the escape hatch
    * for session logic the declarative API can't express (emit-on-close,
    * custom merge rules). Event-time timeout closes a session 30 minutes
    * after its last event as the watermark passes.
    */
  def sessionize(events: Dataset[Event], spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, new Timestamp(s.start), s.n, s.total))
          } else {
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            // process in event-time order; a batch may deliver unordered rows
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionSummary(userId, new Timestamp(s.start), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming rolling z-score — the incremental twin of the batch
    * anomaly scorer (EventQueries.rollingZscore, q:e18): each event is
    * scored against the mean/stddev of the SAME user's previous ≤10
    * values, kept as a bounded ring in flatMapGroupsWithState state —
    * O(frame) bytes per user forever, the property that makes a
    * 100 TB/day keyed-anomaly stream feasible. Sums replay the batch
    * twin's decimal(30,10) discipline exactly (each value rounded to
    * 10 dp half-up, summed exactly, then the identical double
    * mean/variance/z expression), so for in-order delivery the emitted
    * scores are bit-identical to e18's — which the spec asserts against
    * the batch query. Rows inside a batch are processed in
    * (event-time, event_id) order; cross-batch reordering follows
    * arrival, the usual stateful-streaming contract.
    */
  def rollingZscore(events: Dataset[Event], spark: SparkSession): Dataset[ScoredEvent] = {
    import spark.implicits._
    def dec(v: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v).setScale(10, java.math.RoundingMode.HALF_UP)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ZScoreState, ScoredEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[ZScoreState]) =>
          var ring = state.getOption.map(_.values).getOrElse(Nil)
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val z =
              if (ring.size >= 2) {
                val n = ring.size
                val s = ring.foldLeft(java.math.BigDecimal.ZERO)(
                  (a, v) => a.add(dec(v))).doubleValue
                val s2 = ring.foldLeft(java.math.BigDecimal.ZERO)(
                  (a, v) => a.add(dec(v * v))).doubleValue
                val variance = s2 / n - (s / n) * (s / n)
                if (variance > 0) Some((e.value - s / n) / math.sqrt(variance)) else None
              } else None
            ring = (ring :+ e.value).takeRight(10)
            ScoredEvent(e.event_id, userId, e.value, z)
          }
          state.update(ZScoreState(ring))
          out.iterator
      }
  }

  /** Streaming exact-dedup on event_id within the watermark horizon —
    * the at-least-once → exactly-once repair stage of an ingest pipeline.
    */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

  /** Stream-stream interval join — the streaming twin of the batch
    * bounded range join (EventQueries.rangeJoinBucketed, q:e10): each
    * error joins the same user's clicks from the preceding 60 seconds.
    * Both inputs carry watermarks and the predicate bounds click time
    * relative to error time on BOTH ends, so Spark evicts buffered join
    * state as the watermark advances — state tracks the 60 s + watermark
    * horizon, not stream history, at any arrival rate.
    */
  def errorClickJoin(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", "2 hours")
    val c = clicks
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    e.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("error_ts") - expr("INTERVAL 60 SECONDS") &&
        col("click_ts") <= col("error_ts"))
      .select(col("error_id"), col("user_id"), col("error_ts"), col("click_ts"))
  }
}
