package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** One document offered to the ingest quota: `tokens` is its budget
  * cost (top-level case class: nested classes break encoder codegen).
  */
final case class QuotaDoc(source: String, doc_id: Long, tokens: Long)

/** Admission decision with the source's cumulative spend AFTER this
  * document (admitted or not — a rejected doc leaves the counter
  * unchanged, so `cum_tokens` is also the audit trail of what the cap
  * actually absorbed).
  */
final case class QuotaDecision(source: String, doc_id: Long,
    admitted: Boolean, cum_tokens: Long)

/** Per-source ingest quota enforcement on the arbitrary-state API
  * (`transformWithState`, Spark 4's successor to
  * flatMapGroupsWithState): each source key carries one ValueState[Long]
  * of cumulative admitted tokens; a document is admitted iff it fits
  * under `cap`. The data-mixing primitive for capped-source corpora
  * ("at most N tokens of source X per training mix") enforced at ingest
  * time, not by post-hoc sampling.
  *
  * Determinism: documents are decided in doc_id order WITHIN each
  * micro-batch (micro-batch membership itself is the stream's
  * trigger/ordering contract, as everywhere in this package), so replays
  * of the same batch sequence admit the identical set.
  *
  * Scale shape: state is ONE long per source key in the RocksDB store —
  * independent of stream length; the shuffle keys on source. Requires
  * the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass), the documented
  * prerequisite of transformWithState.
  */
class QuotaProcessor(cap: Long)
    extends StatefulProcessor[String, QuotaDoc, QuotaDecision] {

  @transient private var cum: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[QuotaDoc],
      timerValues: TimerValues): Iterator[QuotaDecision] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = rows.toSeq.sortBy(_.doc_id).map { d =>
      val admit = c + d.tokens <= cap
      if (admit) c += d.tokens
      QuotaDecision(key, d.doc_id, admit, c)
    }
    cum.update(c)
    out.iterator
  }
}

object Quota {

  /** Apply the per-source token quota to a streaming Dataset[QuotaDoc].
    * Append-mode output: one QuotaDecision per input document.
    */
  def enforce(docs: Dataset[QuotaDoc], cap: Long): Dataset[QuotaDecision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(cap), TimeMode.None(),
        OutputMode.Append())
  }
}
