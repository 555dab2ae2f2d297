package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 ranked retrieval over the document corpus — the lexical search
  * face a training-data pipeline uses for contamination sweeps ("which
  * corpus docs match this eval question"), targeted sourcing, and
  * boilerplate hunts; the probabilistic-IR standard (Robertson–Sparck
  * Jones weights with the Lucene-style non-negative idf:
  * ln((N − df + 0.5)/(df + 0.5) + 1)).
  *
  * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
  * k1 = 1.2, b = 0.75.
  *
  * Scale shape: the query term set is tiny and BROADCASTS; the corpus
  * scan reduces to (doc, term, tf) for query terms only (explode +
  * broadcast semi — the postings a real inverted index would serve,
  * computed straight off the corpus here), df/N/avgdl are dim-scale
  * aggregates, and the final ranking is a TakeOrderedAndProject (top-k
  * heap per partition, k rows to the driver — never a global sort).
  * Per-term contributions round to 6 and sum in exact DECIMAL(18,6), so
  * the per-doc score is association-order-free and any engine replays it
  * (the returnMoments recipe applied to IR scoring).
  */
object Bm25 {

  /** Unranked per-doc BM25 scores for `terms` (only docs matching at
    * least one query term appear). The ranking-free face `search` and the
    * hybrid RRF fusion (ops.Retrieval) both consume.
    */
  def scores(docs: DataFrame, terms: Seq[String],
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    val q = broadcast(spark.createDataFrame(terms.map(Tuple1(_))).toDF("term"))

    val lens = graft.core.Materialize.once(
      docs.select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), "\\s+")).cast("long")).as("dl")))
    // N docs + total tokens — one 1-row scalar frame, broadcast
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))

    // postings restricted to query terms: explode + broadcast join keeps
    // only matching tokens ahead of the (doc, term) count shuffle
    val tf = graft.core.Materialize.once(
      docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
        .join(q, Seq("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))

    val contrib = tf
      .join(df, Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
              (col("tot").cast("double") / col("n")))), 6)
          .cast(DecimalType(18, 6)).as("c"))

    contrib.groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("double").as("score"))
  }

  def search(docs: DataFrame, terms: Seq[String], k: Int = 20,
             k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scores(docs, terms, k1, b)
      .orderBy(col("score").desc, col("doc_id")).limit(k)

  /** Multi-query BM25 scores over ONE corpus scan: `queryTerms` is a
    * (qid, term) frame — dim-scale (a serving batch of queries), so it
    * BROADCASTS everywhere it appears. Per-(doc, term) tf and per-term
    * df are computed once against the UNION of all query term sets and
    * fan out to queries through the broadcast term join at the end —
    * serving B queries costs the same postings pass as one (the whole
    * point of a serve face). Scoring is [[scores]]' exact recipe
    * verbatim (round-6 contributions, DECIMAL(18,6) sums), so per-qid
    * results equal the single-query path bit-for-bit (spec-pinned).
    * Emits (qid, doc_id, score) for docs matching ≥ 1 of that query's
    * terms.
    */
  def scoresMulti(docs: DataFrame, queryTerms: DataFrame,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queryTerms.select(col("qid"), col("term"))
    val lens = graft.core.Materialize.once(
      docs.select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), "\\s+")).cast("long")).as("dl")))
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))

    val tf = graft.core.Materialize.once(
      docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
        .join(broadcast(q.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))

    val contrib = tf
      .join(df, Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        round(
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
              (col("tot").cast("double") / col("n")))), 6)
          .cast(DecimalType(18, 6)).as("c"))

    contrib.join(broadcast(q), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).cast("double").as("score"))
  }
}
