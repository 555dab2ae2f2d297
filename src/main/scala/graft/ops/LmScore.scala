package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-LM perplexity scoring — the CCNet/LLaMA-style quality filter:
  * train a smoothed bigram LM on a REFERENCE slice of the corpus (here one
  * trusted source), score EVERY document's cross-entropy under it, and
  * prune the tail. This is the train/score-separated cousin of
  * [[TextAnalysis.bigramSurprisal]] (which self-trains, unsmoothed, on the
  * whole corpus and so cannot flag "unlike the reference distribution" —
  * the actual filtering question).
  *
  * Model: add-one bigram LM with OOV folding. Tokens absent from the
  * reference vocabulary map to a reserved `<unk>` type;
  * P(w2|w1) = (c12 + 1) / (c1 + V) where c12 / c1 are reference bigram /
  * history counts and V = |reference vocab| + 1 (the unk type). Unseen
  * histories and bigrams degrade smoothly to 1/V — every document gets a
  * finite score.
  *
  * Scale shape: the model is NEVER collected or broadcast — reference
  * counts live in frames and scoring is two equi-joins on the token keys
  * (bigram, then history), exactly the joins Catalyst shuffles on the
  * string key with map-side partial aggregation upstream. Vocabulary
  * membership is two more left-semi-shaped left joins. At 100 TB the
  * reference slice is corpus-scale and so is its vocab: broadcast-sized
  * nothing, shuffle everything — AQE picks broadcast automatically when a
  * small reference makes the count frames tiny. Per-doc reduction is one
  * groupBy(doc_id) with partial aggregation. Output is replayable: the
  * probability of each bigram is a ratio of small exact integers, so both
  * engines compute ln of the identical double (the bigram_surprisal
  * precedent), and `ppl` exponentiates the ALREADY-ROUNDED log so the
  * compare never sees last-ulp exp drift.
  *
  * [[train]]/[[scoreWith]] split the two phases so a nightly pipeline (or
  * the streaming face, [[graft.streaming.StreamingLmScore]]) trains once
  * per reference snapshot and scores many batches.
  */
object LmScore {

  private def words(text: org.apache.spark.sql.Column) = split(text, "\\s+")

  /** The trained reference model: count/vocab FRAMES (never collected)
    * plus the 1-row V scalar. The frames are lineage-cut, so the holder
    * must not release Materialize blocks while the model is in use.
    */
  final case class LmModel(vocab: DataFrame, c12: DataFrame, c1: DataFrame,
                           vn: DataFrame)

  /** (doc_id, w1, w2) bigram stream for any doc frame. */
  private def bigrams(d: DataFrame) =
    d.withColumn("ws", words(col("text")))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Train the add-one bigram LM on a reference doc frame. */
  def train(ref: DataFrame): LmModel = {
    // reference vocabulary (distinct token types, empty excluded) — cut
    // once: it feeds BOTH membership joins plus the V scalar, and
    // ReuseExchange does not dedupe across the three branches
    val vocab = graft.core.Materialize.once(
      ref.select(explode(words(col("text"))).as("w"))
        .where(col("w") =!= "").distinct())
    // V = |vocab| + 1 (the <unk> type) — a 1-row scalar, broadcast
    val vn = vocab.agg((count(lit(1)) + 1L).as("V"))
    // bigram counts — cut once: feeds the lookup join AND the c1 rollup.
    // Distinct key names per frame (b1/b2, h1) keep the c12-derived c1
    // join unambiguous.
    val c12 = graft.core.Materialize.once(
      bigrams(ref).groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12")))
      .select(col("w1").as("b1"), col("w2").as("b2"), col("c12"))
    val c1 = c12.groupBy(col("b1")).agg(sum(col("c12")).as("c1"))
      .select(col("b1").as("h1"), col("c1"))
    LmModel(vocab, c12, c1, vn)
  }

  /** Score a doc frame under a trained model: per-doc (doc_id, n_bigrams,
    * oov_bigrams, log_ppl, ppl) for every doc with ≥ 2 tokens; log_ppl =
    * avg negative ln P.
    */
  def scoreWith(docs: DataFrame, m: LmModel): DataFrame = {
    // fold OOV tokens to <unk>, then look up counts
    val mapped = bigrams(docs)
      .join(m.vocab.withColumnRenamed("w", "w1").withColumn("k1", lit(true)),
        Seq("w1"), "left")
      .join(m.vocab.withColumnRenamed("w", "w2").withColumn("k2", lit(true)),
        Seq("w2"), "left")
      .select(col("doc_id"),
        when(col("k1").isNull, lit("<unk>")).otherwise(col("w1")).as("w1m"),
        when(col("k2").isNull, lit("<unk>")).otherwise(col("w2")).as("w2m"),
        (col("k1").isNull || col("k2").isNull).as("oov"))

    val scored = mapped
      .join(m.c12, col("w1m") === col("b1") && col("w2m") === col("b2"), "left")
      .join(m.c1, col("w1m") === col("h1"), "left")
      .crossJoin(broadcast(m.vn))
      .select(col("doc_id"), col("oov"),
        (-log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("V")).cast("double"))).as("nll"))

    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("oov_bigrams"),
        round(avg(col("nll")), 6).as("log_ppl"))
      .withColumn("ppl", round(exp(col("log_ppl")), 6))
  }

  /** Self-contained form (the oracled query): reference = the
    * `trainSource` slice of the same corpus.
    */
  def lmPerplexity(docs: DataFrame, trainSource: String = "src0"): DataFrame =
    scoreWith(docs, train(docs.where(col("source") === trainSource)))

  /** CCNet HEAD/MIDDLE/TAIL buckets: the per-language perplexity terciles
    * CCNet gates its whole pipeline on (head = most-reference-like third,
    * tail = the prune candidate) — applied to this engine's reference-LM
    * score. Cutoffs are ORDER STATISTICS, not interpolated percentiles:
    * c₁ = the k-th smallest ppl with k = ⌈n/3⌉ (exact integer (n+2) div 3)
    * and c₂ at ⌈2n/3⌉ — actual observed values, picked identically in any
    * engine (the percentile_disc semantics; interpolation on doubles is
    * engine-float territory). Bucket = head (ppl ≤ c₁) / middle (≤ c₂) /
    * tail; docs the LM cannot score (< 2 tokens) are absent, as in
    * lm_perplexity.
    *
    * Scale shape: CCNet computes cutoffs on a value HISTOGRAM, and so
    * does this — the per-(lang, ppl) count aggregation (map-side
    * combined) shrinks the corpus to its distinct score values BEFORE
    * the per-lang cumulative window runs (never a per-lang window over
    * raw documents — the budget_sample lesson); the lang-dim cutoff
    * table broadcasts back for a map-only labeling pass over the cut
    * scored frame.
    */
  def ccnetBuckets(docs: DataFrame, trainSource: String = "src0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.core.Materialize.once(
      lmPerplexity(docs, trainSource).select(col("doc_id"), col("ppl"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
    val counts = scored.groupBy(col("lang"), col("ppl"))
      .agg(count(lit(1)).as("c"))
    val n = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val wc = Window.partitionBy(col("lang")).orderBy(col("ppl"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cuts = counts
      .withColumn("cum", sum(col("c")).over(wc))
      .join(broadcast(n), Seq("lang"))
      .groupBy(col("lang"))
      .agg(min(when(col("cum") >= expr("(n + 2) div 3"), col("ppl"))).as("c1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("ppl"))).as("c2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("ppl") <= col("c1"), lit("head"))
          .when(col("ppl") <= col("c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
