package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live snapshot-diff classification against a static prior snapshot —
  * the stream face of `TextAnalysis.corpusDiff` for the three statuses a
  * per-record stream CAN decide: added / changed / unchanged. "removed"
  * is a closure property of the WHOLE new snapshot (a doc is removed
  * precisely because it never arrives), so no per-record stream face can
  * emit it before the snapshot closes — run the batch `corpusDiff` at
  * snapshot close for the removed ledger (documented, not hidden).
  *
  * Completely STATELESS stream-static (no watermark, plain append): the
  * prior snapshot collapses to its skinny (doc_id, md5) frame, each
  * micro-batch LEFT-joins it and decides the status map-side. A verdict
  * is a pure function of (record, snapshot), so arbitrary micro-batch
  * splits yield the same rows — the spec pins stream == batch
  * row-for-row, and the per-(source, status) counts aggregate to exactly
  * the batch corpusDiff ledger minus its removed rows.
  *
  * Emits (doc_id, ts, source, h, status).
  */
object StreamingCorpusDiff {

  def run(docs: DataFrame, prior: DataFrame): DataFrame = {
    val pH = prior.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h_p"))
    docs.select(col("doc_id"), col("ts"), col("source"),
        md5(col("text").cast("binary")).as("h"))
      .join(pH, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ts"), col("source"), col("h"),
        when(col("h_p").isNull, lit("added"))
          .when(col("h") =!= col("h_p"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
