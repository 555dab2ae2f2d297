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
  * corpus buckets contribute numReps hash-sampled members (the unified
  * batch skew-cap policy), bounding per-doc fan-out at
  * O(bands·numReps). A match
  * surviving several bands emits once per band (at-least-once) — route
  * through dropDuplicatesWithinWatermark downstream if exactly-once
  * pairs matter.
  *
  * Emits (doc_id, ts, corpus_id, est_jaccard) for candidates at or above
  * `minJaccard`; a doc with no emission is novel by absence.
  */
object StreamingIncrementalDedup {

  def run(docs: DataFrame, corpus: DataFrame, minJaccard: Double = 0.8,
          numPerm: Int = 128, bands: Int = 16, maxBucket: Int = 100,
          numReps: Int = 8): DataFrame = {
    val rows = numPerm / bands

    // static side, computed once per corpus snapshot
    val cSigs = Dedup.minhashSignatures(corpus, numPerm)
    val cBand0 = cSigs.select(col("doc_id").as("corpus_id"), col("sig").as("csig"),
        posexplode(array((0 until bands).map(b =>
          Dedup.bandSig(col("sig"), b, rows)): _*)))
      .toDF("corpus_id", "csig", "band", "bsig")
    val cStats = cBand0.groupBy(col("band"), col("bsig"))
      .agg(count(lit(1)).as("bucket_n"))
    // oversized corpus buckets contribute numReps hash-sampled members —
    // the unified skew-cap policy (see Dedup.minhashLshFromSigs)
    val tagged = cBand0.join(cStats, Seq("band", "bsig"))
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bsig"))
      .orderBy(Dedup.hash32(col("corpus_id").cast("string")), col("corpus_id"))
    val cBand = tagged.where(col("bucket_n") <= maxBucket)
      .select(col("band"), col("bsig"), col("corpus_id"), col("csig"))
      .unionByName(tagged.where(col("bucket_n") > maxBucket)
        .withColumn("hrank", row_number().over(wh))
        .where(col("hrank") <= numReps)
        .select(col("band"), col("bsig"), col("corpus_id"), col("csig")))

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
