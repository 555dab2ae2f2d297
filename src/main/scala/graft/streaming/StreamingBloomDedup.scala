package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live EXACT-dedup screening against a static corpus snapshot — the
  * always-on serving sibling of `Dedup.bloomScreenDedup` (which gives the
  * batch decision frame). Same two-tier design, stream-shaped:
  *
  *  - the Bloom filter over the corpus content hashes is built ONCE per
  *    corpus snapshot (`prepare`) and broadcast — fixed bits, no state
  *    store, nothing grows with stream length;
  *  - each micro-batch probes the filter MAP-ONLY; only screen positives
  *    (true dups + ~fpp strays) reach the stream-static left join against
  *    the skinny distinct corpus-hash frame, so the per-batch join traffic
  *    is proportional to the batch's duplicate mass, not its size.
  *
  * Completely STATELESS streaming (no watermark, plain append mode): the
  * verdict for a doc depends only on its own content and the static
  * snapshot, so arbitrary micro-batch splits give the same rows — the
  * spec pins stream == batch row-for-row. Emits
  * (doc_id, ts, h, screened, is_dup); `is_dup ⇒ screened` carries the
  * Bloom no-false-negative law through the stream face.
  */
object StreamingBloomDedup {

  /** Corpus-snapshot preparation: the sized Bloom filter + the distinct
    * hash frame the verify join probes. Reused across every micro-batch
    * (and across restarts, if the caller persists the snapshot frame).
    */
  def prepare(corpus: DataFrame, fpp: Double = 0.01)
      : (org.apache.spark.util.sketch.BloomFilter, DataFrame) = {
    val cH = corpus.select(Dedup.hash60(col("text")).as("h"))
    val n = math.max(cH.count(), 1L)
    (cH.stat.bloomFilter("h", n, fpp), cH.distinct())
  }

  def run(docs: DataFrame, corpus: DataFrame, fpp: Double = 0.01): DataFrame = {
    // empty snapshot → everything is novel, map-only (a zero-row sketch
    // aggregation yields a null-buffer filter that NPEs on probe — the
    // EmptySweep finding, mirrored from the batch operator)
    if (corpus.isEmpty)
      return docs.select(col("doc_id"), col("ts"),
        Dedup.hash60(col("text")).as("h"),
        lit(false).as("screened"), lit(false).as("is_dup"))
    val (bf, cH) = prepare(corpus, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val might = udf((h: Long) => bc.value.mightContainLong(h))
    val batch = docs.select(col("doc_id"), col("ts"),
        Dedup.hash60(col("text")).as("h"))
      .withColumn("screened", might(col("h")))
    // screen FIRST, join ONLY the positives (the whole point: the
    // stream-static join per batch is sized by duplicate mass, not batch
    // size), then union the map-only negative branch back in
    val verified = batch.where(col("screened"))
      .join(cH.withColumn("dup", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), col("ts"), col("h"), col("screened"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
    batch.where(!col("screened"))
      .select(col("doc_id"), col("ts"), col("h"), col("screened"),
        lit(false).as("is_dup"))
      .unionByName(verified)
  }
}
