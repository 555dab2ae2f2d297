package graft.streaming

import graft.ops.LmScore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the reference-LM perplexity filter
  * ([[graft.ops.LmScore]]) — live quality gating on an ingest stream:
  * documents arrive, each micro-batch is scored under the PRE-TRAINED
  * reference model (train once per reference snapshot — a stream cannot
  * re-count the reference corpus per batch), downstream admission reads
  * (doc_id, log_ppl) and drops the tail.
  *
  * Zero state, no watermark: scoring is per-doc (the per-doc aggregate
  * closes within the doc's own rows, all in one micro-batch), so each
  * batch replays batch [[LmScore.scoreWith]] verbatim via foreachBatch —
  * stream output equals the batch operator row-for-row across arbitrary
  * micro-batch splits (spec-pinned). Re-delivered doc_ids re-score
  * independently (the serving contract shared with StreamingAnnServe);
  * key the sink by batchId to dedup.
  */
object StreamingLmScore {

  def serve(docs: DataFrame, model: LmScore.LmModel)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(LmScore.scoreWith(batch, model), batchId)
      }
      .start()
}
