package graft.streaming

import graft.ops.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** HYBRID-retrieval serving: hybrid queries (vec_id, terms, embedding)
  * arriving on a stream, fused per micro-batch against the STATIC corpus
  * with Reciprocal Rank Fusion — the serving face of
  * `Retrieval.hybridRrf`, completing the retrieval matrix the way every
  * other family's was completed (BM25 and ANN each already serve;
  * fusion was batch-only — the r11 verdict's ask #3).
  *
  * Scale design: completely STATELESS (no watermark, no state store —
  * each query's fused top-k materializes inside its arrival micro-batch
  * because both branch corpora are static). Per batch, the lexical
  * branch runs ONE corpus postings scan for the whole query batch with
  * the term set broadcast (`Bm25.scoresMulti`), and the semantic branch
  * broadcasts the query vectors into either the exact corpus scan
  * ([[serve]]) or the probed cells of a PERSISTED IVF model
  * ([[serveIvf]] — `Ivf.loadModel` in the serving job, the
  * StreamingAnnServe contract). The only big-table operations are those
  * two corpus scans; everything downstream of them is rank-bounded
  * (≤ 2n rows per query through the fusion join, bounded-heap k-cut).
  *
  * Same distinct-qid-per-stream assumption as StreamingAnnServe: a qid
  * re-delivered across batches fuses independently per batch; `sink`
  * receives `batchId` so delivery-ambiguous sources can key on it.
  * Emissions equal the batch `hybridRrfMulti` (and, per qid, the
  * single-query `hybridRrf`) on the same query set — spec-pinned.
  */
object StreamingHybridServe {

  /** Exact-semantic-branch serve: each micro-batch replays
    * [[Retrieval.hybridRrfMulti]]. `sink` receives (qid, rn, doc_id,
    * lex_rn, sem_rn, rrf) per batch.
    */
  def serve(queries: DataFrame, docs: DataFrame, emb: DataFrame,
            n: Int = 20, k: Int = 10, c: Int = 60)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Retrieval.hybridRrfMulti(docs, emb, batch, n, k, c), batchId)
      }
      .start()

  /** Index-served semantic branch: the persisted-IVF scale path
    * ([[Retrieval.hybridRrfMultiWith]] — probes prune the corpus to
    * `nprobe` cells per query). At nprobe = numCells this equals
    * [[serve]] row-for-row (the spec's equality anchor).
    */
  def serveIvf(queries: DataFrame, docs: DataFrame, emb: DataFrame,
               cents: Array[Array[Double]], nprobe: Int = 4,
               n: Int = 20, k: Int = 10, c: Int = 60)
              (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Retrieval.hybridRrfMultiWith(docs, emb, batch, cents, nprobe,
          n, k, c), batchId)
      }
      .start()
}
