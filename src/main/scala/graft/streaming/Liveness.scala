package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One delivery observation per source (top-level for encoder codegen). */
final case class SourceEvent(source: String, ts: Timestamp)

/** Emitted when a source goes silent: no event within `gap` of its last
  * delivery, as judged by the event-time watermark.
  */
final case class SilenceAlert(source: String, last_seen: Timestamp)

/** Ingestion-liveness monitoring on event-time TIMERS — the half of the
  * arbitrary-state API [[QuotaProcessor]] doesn't exercise: each source
  * keeps its max delivered event time and an event-time timer at
  * last_seen + gap; when the watermark passes a timer whose expiry still
  * matches the CURRENT last_seen (stale timers from superseded
  * deliveries fire too — Spark does not auto-cancel — and are ignored by
  * the expiry==last_seen+gap guard), the source has verifiably gone
  * silent and one alert is emitted. Watermark-driven, so alerts are
  * deterministic under replay — a processing-time clock would not be.
  *
  * Scale shape: state is one long + one live timer per source key;
  * shuffle keys on source.
  */
class SilenceProcessor(gapMs: Long)
    extends StatefulProcessor[String, SourceEvent, SilenceAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[SourceEvent],
      timerValues: TimerValues): Iterator[SilenceAlert] = {
    var maxTs = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    rows.foreach(r => maxTs = math.max(maxTs, r.ts.getTime))
    lastSeen.update(maxTs)
    getHandle.registerTimer(maxTs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SilenceAlert] = {
    val last = lastSeen.get()
    if (expiredTimerInfo.getExpiryTimeInMs == last + gapMs)
      Iterator.single(SilenceAlert(key, new Timestamp(last)))
    else Iterator.empty
  }
}

object Liveness {

  /** Alert once per source whose delivery stream stays silent for `gapMs`
    * of event time. `events` must carry the watermark (the caller sets
    * `withWatermark` on ts — timer firing is watermark-driven).
    */
  def silenceAlerts(events: Dataset[SourceEvent], gapMs: Long): Dataset[SilenceAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.source)
      .transformWithState(new SilenceProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
