package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Streaming training-data admission: each micro-batch of raw documents
  * is near-dup-checked against a STANDING MinHash signature index before
  * entering the corpus — the d9 batch-vs-index shape (the operational
  * dedup at 100 TB: the corpus's signatures are materialized once, each
  * drop bands against them) under Structured Streaming execution.
  *
  * The index GROWS: admitted documents' signatures fold into it after
  * every batch, so a duplicate of an earlier admitted batch is flagged
  * too, not just duplicates of the initial corpus. Each fold is an
  * eager localCheckpoint — per-batch lineage stays constant instead of
  * accumulating one union per batch (the classic streaming-state leak
  * when state lives outside the engine) — and the superseded index
  * generation plus the batch's signature checkpoint are unpersisted
  * once the new fold is materialized (core.Checkpoints), so the block
  * manager retains exactly ONE index generation regardless of stream
  * lifetime. The retained state is still the full signature index
  * (growing with admissions), so an indefinitely-lived admission
  * stream should persist the index as an appendable TABLE (the
  * LiteratureStream.parquetSink pattern: append admitted signatures
  * per batch_id, read back per batch) and restart from it.
  * Intra-batch duplicates are the batch operators' job (run
  * Dedup.exact/minhashCandidates on the batch before admission if
  * drops can contain self-dups); this writer's contract is
  * batch-vs-corpus.
  *
  * Scale shape per batch: signatures are one combinable aggregation over
  * the batch (arrival-rate-sized); the band join touches only index rows
  * sharing a band hash with the batch — never corpus × batch.
  */
object CorpusStream {

  final case class BatchAdmissions(batchId: Long, admitted: DataFrame, flagged: DataFrame)

  /** Build the writer: `docs` is a streaming (doc_id, text) frame;
    * `initialSigs` is the standing corpus signature index
    * (Dedup.minhashSignatures output). `sink` receives each batch's
    * admitted and flagged documents.
    *
    * Sink contract: consume (write/count/collect) `admitted` and
    * `flagged` WITHIN the callback. foreachBatch semantics already scope
    * a batch's validity to its invocation, and here the failure mode is
    * hard, not stale: both frames read checkpoint blocks that this
    * writer unpersists right after `sink` returns (the index-fold
    * storage bound), and localCheckpoint leaves no lineage to recompute
    * them from — a retained frame evaluated later fails with a missing
    * checkpoint block, it does not silently reread old state.
    */
  def admissionWriter(docs: DataFrame, initialSigs: DataFrame,
      minSim: Double, sink: BatchAdmissions => Unit): DataStreamWriter[Row] = {
    // mutable standing index — updated once per micro-batch inside
    // foreachBatch (single-threaded per query), checkpointed per fold.
    // SERIALIZED blocks: the index grows with the admitted corpus and is
    // only ever scanned by the band join — the scan-only corpus-sized
    // checkpoint rule (SCALE.md 40M step); deserialized row objects
    // would amplify the standing generation ~5× in the block manager
    // over a long-lived stream.
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    var index = initialSigs.localCheckpoint(true, ser)
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val sigs = Dedup.minhashSignatures(batch).localCheckpoint()
        val dupIds = Dedup.incrementalMinhashCandidates(sigs, index)
          .filter(col("est_sim") >= minSim)
          .select(col("new_id").as("doc_id")).distinct()
        val admitted = batch.join(dupIds, Seq("doc_id"), "left_anti")
        val flagged = batch.join(dupIds, Seq("doc_id"), "left_semi")
        sink(BatchAdmissions(batchId, admitted, flagged))
        val admittedSigs = sigs.join(dupIds, Seq("doc_id"), "left_anti")
        val previous = index
        index = index.unionByName(admittedSigs).localCheckpoint(true, ser)
        // the new fold is materialized (eager checkpoint) — free the
        // superseded generation and the batch's signature blocks so
        // block-manager usage stays one-generation-bounded over a
        // long-lived stream
        graft.core.Checkpoints.unpersistCheckpoint(previous)
        graft.core.Checkpoints.unpersistCheckpoint(sigs)
      }
    }
  }

  /** Drain-what's-there backfill mode, like LiteratureStream.backfill. */
  def backfill(writer: DataStreamWriter[Row]): StreamingQuery =
    writer.trigger(Trigger.AvailableNow()).start()
}
