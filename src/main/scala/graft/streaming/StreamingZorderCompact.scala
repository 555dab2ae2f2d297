package graft.streaming

import graft.ops.Layout
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the z-order layout family: each micro-batch lands
  * z-CLUSTERED (Layout.clusterWrite — range partition + within-file sort
  * on the interleaved key), batch-addressed under `batch=<id>` so
  * foreachBatch's at-least-once replay overwrites its own output instead
  * of duplicating it (the CandleStore.appendBatch convention —
  * effectively-once end to end). A min/max-pruning reader then skips row
  * groups on EVERY interleaved column inside each batch directory from
  * day one — no separate compaction job has to run before the data is
  * skippable (at 100 TB a later compaction pass merely merges small
  * batch files; the layout is already right).
  *
  * `cols` must already be normalized to [0, 2^bits) by the caller's
  * projection (Layout.normalize or a mask) — same contract as the batch
  * face.
  */
object StreamingZorderCompact {

  def run(rows: DataFrame, cols: Seq[String], bits: Int, root: String,
          nFiles: Int, checkpoint: Option[String] = None): StreamingQuery = {
    val sink: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      Layout.clusterWrite(batch, cols, bits, s"$root/batch=$batchId", nFiles)
    val w = rows.writeStream.outputMode("append").foreachBatch(sink)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
