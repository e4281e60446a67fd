package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** One fetch offered to the standing crawl index (top-level case class:
  * nested classes break encoder codegen). `content_hash` is md5 —
  * payloads never enter state.
  */
final case class CrawlFetch(canonical_url: String, fetch_ts: Long,
    content_hash: String)

/** CDC-style admission decision: `new` (first sight of the URL),
  * `changed` (newer fetch, different content), `unchanged` (newer
  * fetch, same content — a refresh), `stale` (loses to the standing
  * fetch under the (ts DESC, hash ASC) total order — late or duplicate
  * delivery, ignored).
  */
final case class CrawlUpdate(canonical_url: String, fetch_ts: Long,
    status: String, content_hash: String)

/** Streaming twin of [[graft.pipelines.CrawlSnapshots.latestWins]] —
  * the recurring-crawl ingest loop as CDC: each canonical URL carries
  * ONE (latest_ts, latest_hash) ValueState, every incoming fetch is
  * resolved against it under the batch path's exact total order
  * (ts DESC, md5 ASC), and downstream consumers see only `new`/`changed`
  * rows instead of re-diffing whole snapshots.
  *
  * Determinism: fetches are decided in (fetch_ts, content_hash) order
  * WITHIN each micro-batch (micro-batch membership is the stream's
  * trigger contract, as everywhere in this package), so a replay of the
  * same batch sequence produces identical statuses, and the final state
  * equals the batch latestWins over the concatenated fetches.
  *
  * Scale shape: state is one (long, 32-char hash) per DISTINCT URL in
  * the RocksDB store — the standing index a crawler needs anyway, never
  * per-fetch; the shuffle keys on canonical_url. Requires the RocksDB
  * state store provider, the documented transformWithState
  * prerequisite.
  */
class LatestWinsProcessor
    extends StatefulProcessor[String, CrawlFetch, CrawlUpdate] {

  @transient private var latest: ValueState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[(Long, String)]("latest",
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CrawlFetch],
      timerValues: TimerValues): Iterator[CrawlUpdate] = {
    var cur: Option[(Long, String)] =
      if (latest.exists()) Some(latest.get()) else None
    val out = rows.toSeq.sortBy(f => (f.fetch_ts, f.content_hash)).map { f =>
      val status = cur match {
        case None => "new"
        // the batch path's total order: (ts DESC, hash ASC) — a
        // same-tick fetch wins only with the smaller hash
        case Some((ts, h))
            if f.fetch_ts > ts || (f.fetch_ts == ts && f.content_hash < h) =>
          if (f.content_hash == h) "unchanged" else "changed"
        case Some(_) => "stale"
      }
      if (status != "stale") cur = Some((f.fetch_ts, f.content_hash))
      CrawlUpdate(key, f.fetch_ts, status, f.content_hash)
    }
    cur.foreach(latest.update)
    out.iterator
  }
}

object CrawlStream {

  /** Canonicalize raw (url, fetch_ts, content) rows into the processor's
    * input shape: [[graft.text.UrlOps.canonicalizeUrl]] folds variants,
    * unparseable URLs drop, content travels as md5 only.
    */
  def fromRaw(fetches: DataFrame): Dataset[CrawlFetch] = {
    import fetches.sparkSession.implicits._
    fetches.select(
        graft.text.UrlOps.canonicalizeUrl(col("url")).as("canonical_url"),
        col("fetch_ts").cast("long").as("fetch_ts"),
        md5(col("content")).as("content_hash"))
      .filter(col("canonical_url").isNotNull)
      .as[CrawlFetch]
  }

  /** Apply latest-wins CDC to a streaming Dataset[CrawlFetch].
    * Append-mode output: one CrawlUpdate per input fetch.
    */
  def latestWins(fetches: Dataset[CrawlFetch]): Dataset[CrawlUpdate] = {
    import fetches.sparkSession.implicits._
    fetches.groupByKey(_.canonical_url)
      .transformWithState(new LatestWinsProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
