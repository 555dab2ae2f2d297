package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live corpus screening: streaming documents checked against a STATIC
  * reference corpus — the always-on serving sibling of
  * `Dedup.incrementalDedup` (which gives the batch per-doc rollup).
  *
  * Scale design: this is a stream-STATIC equi-join on (band, bsig) —
  * completely STATELESS streaming (no watermark, no state store, plain
  * append mode): the stream side computes fused map-side signatures per
  * micro-batch, the corpus side's banding+signature frame is fixed per
  * corpus snapshot and behaves like any dimension input. Oversized
  * corpus buckets contribute only their representative (the batch
  * skew-cap policy), bounding per-doc fan-out at O(bands). A match
  * surviving several bands emits once per band (at-least-once) — route
  * through dropDuplicatesWithinWatermark downstream if exactly-once
  * pairs matter.
  *
  * Emits (doc_id, ts, corpus_id, est_jaccard) for candidates at or above
  * `minJaccard`; a doc with no emission is novel by absence.
  */
object StreamingIncrementalDedup {

  def run(docs: DataFrame, corpus: DataFrame, minJaccard: Double = 0.8,
          numPerm: Int = 128, bands: Int = 16, maxBucket: Int = 100): DataFrame = {
    val rows = numPerm / bands

    // static side, computed once per corpus snapshot
    val cSigs = Dedup.minhashSignatures(corpus, numPerm)
    val cBand0 = cSigs.select(col("doc_id").as("corpus_id"), col("sig").as("csig"),
        posexplode(array((0 until bands).map(b =>
          Dedup.bandSig(col("sig"), b, rows)): _*)))
      .toDF("corpus_id", "csig", "band", "bsig")
    val cStats = cBand0.groupBy(col("band"), col("bsig"))
      .agg(count(lit(1)).as("bucket_n"), min(col("corpus_id")).as("rep"))
    val cBand = cBand0.join(cStats, Seq("band", "bsig"))
      .where(col("bucket_n") <= maxBucket || col("corpus_id") === col("rep"))
      .select(col("band"), col("bsig"), col("corpus_id"), col("csig"))

    // streaming side: fused signatures + banding, then the static join
    docs.select(col("doc_id"), col("ts"),
        Dedup.minhashSig(col("text"), numPerm).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          Dedup.bandSig(col("sig"), b, rows)): _*)))
      .toDF("doc_id", "ts", "sig", "band", "bsig")
      .join(cBand, Seq("band", "bsig"))
      .select(col("doc_id"), col("ts"), col("corpus_id"),
        Dedup.estJaccard(col("sig"), col("csig"), numPerm).as("est_jaccard"))
      .where(col("est_jaccard") >= minJaccard)
  }
}
