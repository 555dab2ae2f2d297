package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live perceptual near-dup screening: streaming media fingerprints
  * (image dHash / audio envelope hash — anything in the 63-bit `dhash`
  * space) checked against a STATIC corpus snapshot — the serving face of
  * `Dedup.dhashNearDup`, and the perceptual sibling of
  * `StreamingSemanticScreen` (the same corner of the four-mode dedup
  * matrix: stream-vs-static stateless screening).
  *
  * Scale design: completely STATELESS (no watermark, no state store,
  * plain append mode). Both sides band into the same 4 pigeonhole
  * chunks (3×16 + 15 bits); the corpus's 4·|corpus| chunk rows are a
  * BROADCAST build side (a dimension input — fixed per snapshot), the
  * stream side explodes 4 rows per arrival, and candidates verify with
  * one xor/popcount. A pair agreeing on several chunks would hit the
  * join once per shared chunk; the emit-once guard keeps only the row
  * whose chunk IS the pair's first agreeing chunk — pure column logic,
  * exactly-once per (arrival, corpus) pair with no dedup state.
  *
  * Emits (doc_id, ts, corpus_id, hamming) for every corpus neighbor
  * within `maxHamming`; an arrival with no emission is perceptually
  * novel by absence (the StreamingSemanticScreen contract).
  */
object StreamingDhashScreen {

  private def chunkOf(h: Column, c: Int): Column =
    shiftrightunsigned(h, c * 16)
      .bitwiseAND(lit(if (c == 3) 0x7FFFL else 0xFFFFL))

  /** First chunk index on which the two hashes agree — the emit-once
    * key. Rows reaching this comparison came through a chunk-equi join,
    * so at least one chunk agrees and the otherwise branch is safe. */
  private def firstMatchChunk(a: Column, b: Column): Column =
    when(chunkOf(a, 0) === chunkOf(b, 0), 0)
      .when(chunkOf(a, 1) === chunkOf(b, 1), 1)
      .when(chunkOf(a, 2) === chunkOf(b, 2), 2)
      .otherwise(3)

  /** `stream`: streaming (doc_id, ts, dhash); `corpus`: static
    * (doc_id, dhash). Null hashes (failed decodes) drop on both sides.
    */
  def run(stream: DataFrame, corpus: DataFrame,
          maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole guarantee holds for maxHamming <= 3 with 4 chunks")
    val cchunks = corpus.where(col("dhash").isNotNull)
      .select(col("doc_id").as("corpus_id"), col("dhash").as("ch"),
        posexplode(array((0 until 4).map(c => chunkOf(col("dhash"), c)): _*)))
      .toDF("corpus_id", "ch", "chunk", "cval")
    stream.where(col("dhash").isNotNull)
      .select(col("doc_id"), col("ts"), col("dhash").as("sh"),
        posexplode(array((0 until 4).map(c => chunkOf(col("dhash"), c)): _*)))
      .toDF("doc_id", "ts", "sh", "chunk", "cval")
      .join(broadcast(cchunks), Seq("chunk", "cval"))
      .withColumn("hamming",
        bit_count(col("sh").bitwiseXOR(col("ch"))).cast("long"))
      .where(col("hamming") <= maxHamming &&
        col("chunk") === firstMatchChunk(col("sh"), col("ch")))
      .select(col("doc_id"), col("ts"), col("corpus_id"), col("hamming"))
  }
}
