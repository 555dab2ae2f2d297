package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for an LLM training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. Everything is composed
  * from codegen'd built-ins (split / higher-order filter / regexp) — no
  * UDFs — so the whole stage stays inside WholeStageCodegen and is map-only
  * (zero shuffle) at any scale.
  */
object TextAnalysis {

  /** Whitespace word list. */
  private def words(text: Column): Column = split(text, "\\s+")

  /** THE whitespace token count — the one null convention for the whole
    * packing/mix family (pack_plan, packing_stats, mix_report,
    * mix_rebalance, budget_sample, StreamingMixMonitor): null text counts
    * 0 tokens. Guarded on the INPUT being null, not on size()'s result —
    * under `spark.sql.legacy.sizeOfNull=true`, size(null) returns -1
    * (non-null, so a coalesce never fires) and a -1 would silently walk
    * running totals backwards; the isNull branch is conf-independent.
    */
  private[graft] def tokens(text: Column): Column =
    when(text.isNull, lit(0L)).otherwise(size(words(text)).cast("long"))

  /** Count of words from `text` that appear in `set`. */
  private def hitCount(text: Column, set: Seq[String]): Column =
    size(filter(words(text), w => w.isin(set.map(lit(_)): _*)))

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  /** Language markers: tiny stopword profiles per language + CJK chars for
    * zh. Deterministic argmax with fixed preference order on ties.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "que", "una"))

  /** (doc_id, lang, pred_lang): n-gram/stopword-profile language ID. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = Markers.foldLeft(docs) { case (d, (lang, ms)) =>
      d.withColumn(s"s_$lang", hitCount(col("text"), ms).cast("long"))
    }.withColumn("s_zh",
      length(regexp_replace(col("text"), "[^一-鿿]", "")).cast("long"))
    val pred =
      when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es"), col("s_zh")), "en")
        .when(col("s_de") >= greatest(col("s_fr"), col("s_es"), col("s_zh")), "de")
        .when(col("s_fr") >= greatest(col("s_es"), col("s_zh")), "fr")
        .when(col("s_es") >= col("s_zh"), "es")
        .otherwise("zh")
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }

  /** Quality features + composite score. Divisors are null-guarded: an
    * empty document yields null ratios/score instead of an ANSI
    * DIVIDE_BY_ZERO that would kill the whole job (found by the
    * null-robustness spec; no effect on non-degenerate rows).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nWords = size(words(col("text"))).cast("double")
    val nChars = length(col("text")).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[a-z0-9\\s]", "")).cast("double")
    val nStop = hitCount(col("text"), Stopwords).cast("double")
    val safeChars = when(nChars > 0, nChars) // null divisor -> null ratio
    val safeWords = when(nWords > 0, nWords)
    docs.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      (nPunct / safeChars).as("punct_ratio"),
      (nStop / safeWords).as("stop_ratio"),
      scoreColumn(col("text")).as("score"))
  }

  /** Column form of the composite quality score — shared with
    * Dedup.corpusDedup so the keeper choice folds into the corpus's single
    * materialized full-text pass instead of a second corpus scan.
    */
  private[graft] def scoreColumn(text: Column): Column = {
    val nWords = size(words(text)).cast("double")
    val nChars = length(text).cast("double")
    val nPunct = length(regexp_replace(text, "[a-z0-9\\s]", "")).cast("double")
    val nStop = hitCount(text, Stopwords).cast("double")
    val safeChars = when(nChars > 0, nChars) // null divisor -> null score
    val safeWords = when(nWords > 0, nWords)
    lit(0.5) * (nStop / safeWords) + lit(0.3) * (lit(1.0) - nPunct / safeChars) +
      lit(0.2) * least(nWords / lit(100.0), lit(1.0))
  }

  /** Whitespace + BPE-ish subword token counts. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_subword_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"))

  /** LEXICAL DIVERSITY per document — type/token ratio and the Guiraud
    * index (types/√tokens, the length-robust variant): the curation
    * signal that catches templated or loop-generated text which passes
    * length and stopword screens (low diversity ⇒ the same words cycling)
    * — complementary to repetition_score (verbatim n-gram repeats) and
    * char_entropy (character-level). Pure map over the text scan: both
    * counts come from the one split array (array_distinct is per-row),
    * no shuffle at all; divisions are fixed-order doubles on integer
    * inputs (√ is IEEE-exact in both engines), null-guarded on empty
    * docs, rounded at emission.
    */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    docs.select(col("doc_id"),
      size(ws).cast("long").as("n_words"),
      size(array_distinct(ws)).cast("long").as("n_distinct"))
      .withColumn("ttr", round(col("n_distinct").cast("double") /
        when(col("n_words") > 0, col("n_words").cast("double")), 6))
      .withColumn("guiraud", round(col("n_distinct").cast("double") /
        when(col("n_words") > 0, sqrt(col("n_words").cast("double"))), 6))
  }

  /** DATASET CARD per source — the one-look corpus report a data release
    * ships with (HuggingFace dataset-card numbers, computed instead of
    * hand-written): volume (docs, chars, mean/p50/p95 length), language
    * make-up (count, dominant language, Shannon entropy of the language
    * mix), and the exact-duplicate rate. The report is the aggregation
    * layer over signals other operators act on (dedup_exact acts on the
    * duplicates; mix_* acts on the language mix) — here they become one
    * frame per source for monitoring and release notes.
    *
    * Scale shape: ONE corpus scan feeds a per-source aggregation
    * (percentiles over the integer n_chars column — the
    * session_percentiles engine-stable recipe), a (source, md5) pre-
    * aggregation for the distinct count (two-level, skew-safe: never a
    * count-distinct expand over the fact), and a (source, lang) count
    * table that is dim-scale by construction — top language via the
    * deterministic (cnt desc, lang asc) argmax, entropy from terms
    * rounded to 6 in exact decimal sums. Everything after the first
    * aggregations is dim-scale joins.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = graft.core.Materialize.once(docs.select(
      col("source"), col("lang"), col("n_chars"),
      md5(col("text").cast("binary")).as("h")))
    val vol = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      round(expr("percentile(n_chars, 0.5)"), 0).cast("long").as("p50_chars"),
      round(expr("percentile(n_chars, 0.95)"), 0).cast("long").as("p95_chars"))
    val dup = base.groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_distinct"))
    val lc = base.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    val top = lc.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("lang"))))
      .where(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    val langs = lc.join(vol.select(col("source"), col("n_docs")), Seq("source"))
      .withColumn("p", col("c").cast("double") / col("n_docs").cast("double"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_langs"),
        sum(when(col("c") === col("n_docs"), lit(0.0))
          .otherwise(round(-(col("p") * log(col("p"))), 6))
          .cast(DecimalType(18, 6))).cast("double").as("ent"))
    vol.join(dup, Seq("source")).join(langs, Seq("source")).join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        round(col("total_chars").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_chars"),
        col("p50_chars"), col("p95_chars"), col("n_langs"), col("top_lang"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        round(col("ent"), 6).as("lang_entropy"))
  }

  /** TOKENIZER FERTILITY per language — subword tokens per whitespace
    * word and characters per subword token, aggregated by `lang`: the
    * standard tokenizer-efficiency report (a language with fertility 3×
    * the corpus mean pays 3× the context budget per word — the number
    * behind vocabulary-allocation and per-language budget decisions,
    * computed here with the same BPE-ish segmentation token_count uses).
    * Integer token counts sum exactly (LongType); the two ratios are
    * fixed-order doubles on those exact sums, null-guarded, rounded at
    * emission. ONE map-side-combined aggregation over the text scan.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
      size(words(col("text"))).cast("long").as("w"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long").as("s"),
      col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("ws_tokens"),
        sum(col("s")).as("subword_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("subword_tokens"),
        round(col("subword_tokens").cast("double") /
          when(col("ws_tokens") > 0, col("ws_tokens").cast("double")), 6)
          .as("fertility"),
        round(col("total_chars").cast("double") /
          when(col("subword_tokens") > 0, col("subword_tokens").cast("double")), 6)
          .as("chars_per_token"))

  /** Content fingerprint: md5 + structural signature. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("fp"),
      substring(md5(col("text").cast("binary")), 1, 8).as("fp_prefix"),
      length(col("text")).cast("long").as("n_chars_actual"),
      size(words(col("text"))).cast("long").as("n_words"))

  /** Corpus-level n-gram frequency: the top-`topN` word `n`-grams with
    * counts (contamination screening / template detection in a training
    * corpus). Explode is map-side; the groupBy partial-aggregates per
    * n-gram BEFORE the shuffle, so reducers see one row per distinct
    * n-gram per map task — hot n-grams combine, they don't skew. The
    * final top-N is a TakeOrdered (no global sort). Ties break on the
    * n-gram string for cross-engine determinism.
    */
  def ngramFreq(docs: DataFrame, n: Int = 2, topN: Int = 20): DataFrame =
    // materialize the word array behind a filter barrier so the shingle
    // lambda reads a bound attribute — inlining `split` into the transform
    // re-evaluates it per element, O(words²) per doc
    docs.withColumn("ws", split(col("text"), "\\s+"))
      .where(size(col("ws")) >= n)
      .select(explode(Dedup.shinglesFromWords(col("ws"), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(topN)

  /** Corpus-level bigram COLLOCATIONS by pointwise mutual information:
    * PMI = ln(p(ab) / (p(a)·p(b))) over whitespace tokens — the classic
    * collocation extractor (Church & Hanks 1990) that separates "New York"
    * from "of the", which raw bigram frequency (ngramFreq) cannot. The
    * `minCount` floor removes the low-count PMI pathology (hapax pairs
    * score arbitrarily high).
    *
    * Scale shape: two map-side-combined hash aggregations (unigrams,
    * bigrams) over map-only explodes; the bigram table shrinks to the
    * ≥ minCount survivors BEFORE the two vocabulary equi-joins (dim-scale
    * probe side, AQE sizes the build); corpus totals are a 1-row broadcast
    * crossJoin. Never a pair join over the corpus. Counts are exact
    * integers; PMI is a fixed-order double formula rounded to 6 (the
    * return_moments ln precedent). Empty tokens (leading/multiple
    * whitespace artifacts) are filtered on both engines.
    */
  def bigramPmi(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val d = docs
      .withColumn("ws", filter(split(col("text"), "\\s+"), w => w =!= ""))
      .where(size(col("ws")) >= 2)
    val totals = d.agg(
      sum(size(col("ws")).cast("long")).as("nu"),
      sum((size(col("ws")) - 1).cast("long")).as("nb"))
    val uni = d.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val bi = d.select(explode(expr(
      "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    bi
      .join(uni.select(col("w").as("w1"), col("cu").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        round(log(
          (col("n_ab").cast("double") / col("nb").cast("double")) /
            ((col("n_a").cast("double") / col("nu").cast("double")) *
              (col("n_b").cast("double") / col("nu").cast("double")))), 6)
          .as("pmi"))
  }

  /** Canonical text normalization (the C4-style cleanup pass): lowercase,
    * collapse runs of whitespace, trim. Emitted as the normalized
    * fingerprint + lengths so downstream exact-dedup can key on it.
    * Map-only, pure codegen'd built-ins.
    */
  def normalize(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    docs.select(
      col("doc_id"),
      md5(norm.cast("binary")).as("norm_fp"),
      length(norm).cast("long").as("n_chars_norm"),
      length(col("text")).cast("long").as("n_chars_raw"))
  }

  /** End-to-end corpus curation — the composed pass a training pipeline
    * runs per snapshot: quality gate → canonical normalization →
    * exact-dedup on the normalized fingerprint (keep the best-quality
    * copy, ties to lowest doc_id). Emits the per-doc decision record
    * (auditable lineage, not just the survivor set). Everything upstream
    * is map-only; the only shuffle is the canonical-group aggregation,
    * one row per distinct normalized fingerprint.
    */
  def curate(docs: DataFrame, minScore: Double = 0.42): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val scored = qualityScore(docs).select(col("doc_id"), col("score"))
    val staged = docs.select(col("doc_id"), md5(norm.cast("binary")).as("norm_fp"))
      .join(scored, "doc_id")
      .withColumn("passed_quality", col("score") >= minScore)
    val keepers = staged.where(col("passed_quality"))
      .groupBy(col("norm_fp"))
      .agg(min_by(col("doc_id"), struct(negate(col("score")), col("doc_id"))).as("keep_id"))
    staged.join(keepers, Seq("norm_fp"), "left")
      .select(col("doc_id"), col("norm_fp"), round(col("score"), 6).as("score"),
        col("passed_quality"),
        (col("passed_quality") && col("doc_id") === col("keep_id")).as("kept"))
  }

  /** Deterministic stratified sampling — training-mix construction: each
    * stratum (e.g. source) keeps the fraction `rates(stratum)` of its
    * docs, chosen by a portable content hash of the doc id, NOT rand().
    * Reproducible across runs/engines/partitionings (the sample is a pure
    * function of the data), map-only, and any SQL engine can replay it.
    * Unlisted strata default to rate 0 (drop).
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       rates: Map[String, Double]): DataFrame = {
    // hash32(doc_id) / 2^32 is uniform in [0,1): keep if below the rate
    val u = Dedup.hash32(col("doc_id").cast("string")).cast("double") /
      lit(4294967296.0)
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.where(u < rate)
      .select(col("doc_id"), col(stratumCol).as("stratum"))
  }

  /** PII scrub: redact email-like and long-digit-run tokens, report
    * redaction counts per doc (the pipeline pass a corpus runs before
    * training). Patterns are portable regex (same semantics in Java and
    * RE2 engines). Map-only.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val digits = "[0-9][0-9 ()-]{6,}[0-9]"
    val clean = regexp_replace(
      regexp_replace(col("text"), email, "<EMAIL>"), digits, "<NUMBER>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(email), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all(col("text"), lit(digits), lit(0))).cast("long")
        .as("n_digit_runs"),
      md5(clean.cast("binary")).as("clean_fp"),
      length(clean).cast("long").as("n_chars_clean"))
  }

  /** Decontamination screen for a training corpus: fraction of each
    * corpus doc's distinct 3-shingles that appear anywhere in the
    * benchmark/eval set (`source == benchmarkSource`). The classic
    * train/test-overlap check run before every pretraining job.
    *
    * Scale design: an eval set is dim-scale next to a 100 TB corpus, so
    * its distinct shingle set BROADCASTS; the corpus side is one map-only
    * shingle explode + broadcast-hash semi hit-count, then a single
    * aggregation by doc — no corpus-sized shuffle beyond the per-doc
    * counts. Zero-hit and sub-3-word docs are kept (containment 0 / null)
    * via the left join of per-doc totals.
    */
  def contaminationCheck(docs: DataFrame, benchmarkSource: String = "src0",
                         threshold: Double = 0.5): DataFrame = {
    // one materialized shingle scan shared by the benchmark branch and
    // both corpus branches (explode + per-doc totals) — the corpus text
    // is read exactly once (see core.Materialize)
    val sh = graft.core.Materialize.once(docs.withColumn("ws", words(col("text")))
      .select(col("doc_id"), col("source"),
        array_distinct(Dedup.shinglesFromWords(col("ws"))).as("sh")))
    val bench = sh.where(col("source") === benchmarkSource)
      .select(explode(col("sh")).as("s")).distinct()
    val corpus = sh.where(col("source") =!= benchmarkSource)
    val hits = corpus.select(col("doc_id"), explode(col("sh")).as("s"))
      .join(broadcast(bench), "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    corpus.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("containment", when(col("n_shingles") > 0,
        round(col("n_hit").cast("double") / col("n_shingles"), 6)))
      .withColumn("contaminated", col("containment") >= threshold)
  }

  /** Per-doc top-k TF-IDF terms (corpus vocabulary profiling / keyword
    * extraction). idf = ln((N+1)/(df+1)); scores are rounded to 6 decimals
    * BEFORE ranking so the ordering is engine-stable, ties break on the
    * term. Shuffles: one for (doc, term) counts (map-side combine), a
    * vocabulary-sized one for document frequencies, and the per-doc rank
    * via the bounded-heap TopKTermsByScore aggregate — each map task emits
    * at most k rows per doc, so a pathological doc with a huge distinct
    * vocabulary never becomes one fat sorted window partition. The doc
    * count rides along as a broadcast 1-row aggregate — no driver action.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.functions.{ScoredTerm, TopKTermsByScore}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val terms = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .where(col("term") =!= "")
    // tf feeds the document-frequency aggregation AND the scoring join:
    // one lazy cut instead of two explode+count passes over the corpus
    val tf = graft.core.Materialize.once(
      terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val agg = udaf(new TopKTermsByScore(k), ExpressionEncoder[ScoredTerm]())
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
      .groupBy(col("doc_id"))
      .agg(agg(col("score"), col("term"), col("tf")).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), col("col.term").as("term"), col("col.tf").as("tf"),
        col("col.score").as("score"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Bigram-surprisal quality proxy: average -ln p(w2|w1) per doc under
    * the corpus's own bigram model — the classic cheap stand-in for a
    * model-based quality filter (high surprisal = unnatural word
    * sequences: boilerplate, mangled text, spam).
    *
    * Scale design: the exploded bigram frame is materialized once and
    * feeds both the count aggregation and the scoring join; unigram
    * counts DERIVE from the bigram counts (sum over w2) instead of a
    * second corpus pass. Two skinny-key joins (vocabulary-sized), one
    * per-doc average. p is exact-rational per bigram (count ratio), only
    * the final ln/avg is floating point, rounded for engine stability.
    */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val bi = graft.core.Materialize.once(
      docs.withColumn("ws", words(col("text")))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c1").cast("double") / col("c12"))), 6).as("surprisal"))
  }

  /** Sequence-packing stats per stratum — the batch-planning question a
    * training pipeline asks before tokenizing 100 TB: how many
    * context-length windows does this corpus need, and how much padding
    * does naive one-doc-per-window batching waste vs dense packing?
    * `windows_padded` = Σ ceil(tokens/ctx) (each doc alone, padded);
    * `windows_packed` = ceil(Σ tokens / ctx) (ideal dense packing — the
    * lower bound any packer approaches). Pure integer arithmetic until
    * the final waste ratio, so exact in any engine; one map pass + one
    * aggregation keyed by the (low-cardinality) stratum.
    */
  def packingStats(docs: DataFrame, ctx: Int = 64): DataFrame =
    packingStatsOn(docs.select(col("source"), tokens(col("text")).as("n_tokens")), ctx)

  /** [[packingStats]] over a PRE-COMPUTED token frame (source, n_tokens)
    * — the drop-in for real-tokenizer counts ([[Bpe.withTokens]]).
    */
  def packingStatsOn(toks: DataFrame, ctx: Int = 64): DataFrame = {
    val t = col("n_tokens")
    val w = floor((t + lit(ctx - 1)) / lit(ctx)).cast("long")
    toks.select(col("source"), t.as("t"), w.as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("total_tokens"),
        max(col("t")).as("max_tokens"),
        sum(when(col("t") > ctx, 1L).otherwise(0L)).as("n_over_ctx"),
        sum(col("w")).as("windows_padded"),
        floor((sum(col("t")) + lit(ctx - 1)) / lit(ctx)).cast("long").as("windows_packed"))
      .withColumn("padding_waste",
        round((col("windows_padded") * ctx - col("total_tokens")).cast("double") /
          (col("windows_padded") * ctx), 6))
  }

  /** Sequence-packing PLAN — packingStats' executable sibling: the actual
    * GPT-style dense-packing layout. Documents concatenate per stratum in
    * (lang, doc_id) order into `capacity`-token sequences that docs may
    * straddle; each doc gets the sequence it starts in (`seq_id`), its
    * token offset there (`seq_offset`), and how many sequences it touches
    * (`n_seqs`) — the deterministic shard map a tokenizer fleet consumes.
    *
    * Scale design: the per-stratum running token total is the distributed
    * two-pass [[Scan.withRunningTotal]] — a per-lang window would put
    * each language in ONE task at 100 TB. Everything else is map-only
    * integer arithmetic (exact in any engine).
    */
  def packPlan(docs: DataFrame, capacity: Int = 2048): DataFrame =
    // null text → 0 tokens (the scan's value column must be non-null;
    // a null would otherwise kill the job executor-side)
    packPlanOn(docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("n_tokens")), capacity)

  /** [[packPlan]] over a PRE-COMPUTED token frame (doc_id, lang,
    * n_tokens) — swap in [[Bpe.withTokens]]' real-tokenizer counts and
    * the layout comes out in the tokenizer's own units.
    */
  def packPlanOn(toks: DataFrame, capacity: Int = 2048): DataFrame = {
    Scan.withRunningTotal(
      toks.select(col("doc_id"), col("lang"), col("n_tokens")),
      Seq("lang"), Seq("doc_id"), "n_tokens")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_before div $capacity").as("seq_id"),
        (col("cum_before") % capacity).as("seq_offset"))
      .withColumn("n_seqs", when(col("n_tokens") > 0,
        expr(s"(seq_offset + n_tokens - 1) div $capacity") + 1L)
        .otherwise(0L))
  }

  /** Mix REBALANCING — mix_report's executable sibling: derive the
    * per-language sampling rate that equalizes token shares (uniform
    * target: every language capped at the smallest language's token
    * mass, rate = min_lang_tokens / lang_tokens) and emit the
    * deterministic per-doc keep decision via the portable content hash —
    * reproducible across runs, engines, and partitionings, like
    * `corpusSample` but with DERIVED rates instead of given ones.
    *
    * Scale design: two dim-scale aggregations broadcast back, decision
    * map-only; the keep comparison uses unrounded IEEE doubles (both
    * engines compute bit-identical quotients), the reported `rate` is
    * rounded for display only. Docs with a NULL lang have no stratum and
    * are excluded (standard equi-join semantics, same in the oracle);
    * null text counts 0 tokens.
    */
  def mixRebalance(docs: DataFrame): DataFrame =
    mixRebalanceOn(docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("n_tokens")))

  /** [[mixRebalance]] over a PRE-COMPUTED token frame (doc_id, lang,
    * n_tokens) — real-tokenizer token shares via [[Bpe.withTokens]].
    */
  def mixRebalanceOn(toks: DataFrame): DataFrame = {
    val byLang = toks.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
    val minTok = byLang.agg(min(col("lang_tokens")).as("min_tokens"))
    val rate = col("min_tokens").cast("double") / col("lang_tokens").cast("double")
    toks.join(broadcast(byLang), "lang")
      .crossJoin(broadcast(minTok))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(rate, 6).as("rate"),
        (Dedup.hash32(col("doc_id").cast("string")).cast("double") /
          lit(4294967296.0) < rate).as("keep"))
  }

  /** TEMPERATURE mix sampling — the general form of [[mixRebalance]] and
    * the multilingual-training standard: language sampling shares
    * ∝ (token share)^(1/T), so low-resource languages are boosted
    * smoothly instead of capped hard. Keep rates are the largest budget
    * at which no language exceeds rate 1: with w_l = tokens_l^(1/T),
    * rate_l = (w_l / tokens_l) · min_k(tokens_k / w_k), which collapses
    * to rate_l = min_k(tokens_k^e) / tokens_l^e with e = 1 − 1/T.
    * T = 1 (e = 0) keeps everything — the natural mix IS the
    * proportional mix; T → ∞ (e → 1) recovers [[mixRebalance]]'s uniform
    * cap min_tokens / tokens_l exactly (spec-pinned at both ends).
    *
    * Scale design: identical to mixRebalance — two dim-scale
    * aggregations broadcast back, decision map-only. One portability
    * difference, deliberate: the keep comparison uses the rate ROUNDED
    * to 6 decimals (not the raw double) because pow() is not bit-portable
    * across engines the way a single IEEE division is — a 1-ulp libm
    * difference dies in the rounding, so the decision replays exactly.
    */
  def mixTemperature(docs: DataFrame, temperature: Double = 2.0): DataFrame =
    mixTemperatureOn(docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("n_tokens")), temperature)

  /** [[mixTemperature]] over a PRE-COMPUTED token frame (doc_id, lang,
    * n_tokens) — real-tokenizer token shares via [[Bpe.withTokens]].
    */
  def mixTemperatureOn(toks: DataFrame, temperature: Double = 2.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val e = 1.0 - 1.0 / temperature
    val byLang = toks.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .select(col("lang"), col("lang_tokens"),
        pow(col("lang_tokens").cast("double"), lit(e)).as("cap"))
    val minCap = byLang.agg(min(col("cap")).as("min_cap"))
    val rate = round(col("min_cap") / col("cap"), 6)
    toks.join(broadcast(byLang), "lang")
      .crossJoin(broadcast(minCap))
      .select(col("doc_id"), col("lang"), col("n_tokens"), rate.as("rate"),
        (Dedup.hash32(col("doc_id").cast("string")).cast("double") /
          lit(4294967296.0) < rate).as("keep"))
  }

  /** Deterministic train/val/test corpus split via the portable content
    * hash — reproducible across runs, engines, and partitionings (the
    * property that keeps eval sets stable as the pipeline re-runs), and
    * stratum-independent by construction: the hash ignores lang/source,
    * so every stratum's split fractions concentrate at the global
    * fractions without per-stratum bookkeeping (spec-measured). Map-only;
    * `salt` rotates the assignment without touching the data (new split
    * epoch = new salt).
    */
  def corpusSplit(docs: DataFrame, trainFrac: Double = 0.8,
                  valFrac: Double = 0.1, salt: String = ""): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      splitColumn(col("doc_id"), trainFrac, valFrac, salt).as("split"))

  /** The split assignment as a pure COLUMN over the doc id — corpusSplit
    * emits it, and anything holding doc ids (e.g. near-dup pairs in
    * [[splitLeakage]]) can recompute a doc's split with no join.
    */
  private[graft] def splitColumn(id: Column, trainFrac: Double,
                                 valFrac: Double, salt: String): Column = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"invalid split fractions ($trainFrac, $valFrac)")
    val u = Dedup.hash32(concat(id.cast("string"), lit(salt)))
      .cast("double") / lit(4294967296.0)
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Train/eval LEAKAGE audit: near-duplicate pairs that STRADDLE a split
    * boundary — the eval-hygiene failure `decontaminate` cannot see
    * (that op screens against a named benchmark list; this one catches
    * contamination the split itself created, where a doc's near-copy
    * lands in a different split and eval leaks through the duplicate).
    * Composes the banded MinHash candidate pairs with [[splitColumn]]
    * recomputed on BOTH pair ids — a pure expression, so no join and no
    * extra shuffle beyond the pair generation itself. Emits
    * (id1, id2, est_jaccard, split1, split2) for straddling pairs at or
    * above `minJaccard`.
    */
  def splitLeakage(docs: DataFrame, minJaccard: Double = 0.5,
                   trainFrac: Double = 0.8, valFrac: Double = 0.1,
                   salt: String = ""): DataFrame =
    Dedup.minhashLsh(docs)
      .where(col("est_jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("est_jaccard"),
        splitColumn(col("id1"), trainFrac, valFrac, salt).as("split1"),
        splitColumn(col("id2"), trainFrac, valFrac, salt).as("split2"))
      .where(col("split1") =!= col("split2"))

  /** Per-stratum quality pruning at an exact per-language score quantile:
    * keep docs scoring at or above their OWN language's q-quantile — a
    * global threshold would evict entire low-resource languages whose
    * score distribution sits lower (the same stratum-fairness argument
    * mix_rebalance makes for token mass). Scores and thresholds are
    * rounded to 6 decimals before the comparison so the kept set is
    * engine-stable. One map pass + one dim-scale exact-percentile
    * aggregation broadcast back; the keep decision is map-only.
    */
  def qualityPrune(docs: DataFrame, q: Double = 0.25): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"),
      round(scoreColumn(col("text")), 6).as("score"))
    val thr = scored.groupBy(col("lang"))
      .agg(round(expr(s"percentile(score, $q)"), 6).as("lang_thr"))
    scored.join(broadcast(thr), "lang")
      .select(col("doc_id"), col("lang"), col("score"), col("lang_thr"),
        (col("score") >= col("lang_thr")).as("keep"))
  }

  /** Per-stratum token-BUDGET sample: docs shuffle deterministically by
    * the portable content hash, then each language keeps the prefix whose
    * tokens START inside its `budget` — "give me ~N tokens per language"
    * (the fixed-budget cousin of mix_rebalance's rate balancing; the doc
    * straddling the boundary is kept, like pack_plan's straddle rule).
    *
    * Scale design: the running total is the distributed two-pass
    * [[Scan.withRunningTotal]] ordered by (hash, doc_id) — same primitive
    * as pack_plan, so giant languages span partitions; everything else is
    * map-only. Emits (doc_id, lang, n_tokens, cum_before, keep).
    */
  def budgetSample(docs: DataFrame, budget: Long = 20000): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("n_tokens"),
      Dedup.hash32(col("doc_id").cast("string")).as("h"))
    Scan.withRunningTotal(toks, Seq("lang"), Seq("h", "doc_id"), "n_tokens")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_before"),
        (col("cum_before") < budget).as("keep"))
  }

  /** C4/RefinedWeb-style PER-DOMAIN DOCUMENT CAP: at most `cap` docs per
    * source, keeping each source's HIGHEST-QUALITY docs (score ties break
    * on the lower doc_id) — the guard against one dominant crawl domain
    * swamping the training mix, which the language-mix family
    * (mix_rebalance / budget_sample) cannot express because it balances
    * languages, not sources. Emits (doc_id, source, score, keep) for
    * EVERY doc, qualityPrune-style, so the decision composes with other
    * keep columns.
    *
    * Scale design: the per-source selection is the bounded TopKByScore
    * heap — every map task reduces its partition to ≤ cap rows per source
    * BEFORE the shuffle (O(cap × partitions) shuffled rows per source,
    * never a per-source row_number window that sorts a giant domain in
    * one partition); the keeper set joins back by doc_id equi-join. Docs
    * with a null quality score (no words) are keep=false and never enter
    * the heap.
    */
  def domainCap(docs: DataFrame, cap: Int = 15): DataFrame = {
    import graft.functions.{ScoredId, TopKByScore}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = udaf(new TopKByScore(cap), ExpressionEncoder[ScoredId]())
    val scored = docs.select(col("doc_id"), col("source"),
      round(scoreColumn(col("text")), 6).as("score"))
    val kept = scored.where(col("score").isNotNull)
      .groupBy(col("source"))
      .agg(agg(col("score"), col("doc_id")).as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.id").as("doc_id"), lit(true).as("k"))
    scored.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("score"),
        coalesce(col("k"), lit(false)).as("keep"))
  }

  /** The TOKEN-budget flavor of [[domainCap]]: each source keeps the
    * deterministic-hash-ordered prefix of docs whose tokens START inside
    * `budget` — "at most ~N tokens per domain" (budget_sample's stratum
    * swapped from language to source; the straddling doc is kept, same
    * rule). Same distributed two-pass [[Scan.withRunningTotal]] — giant
    * domains span partitions, no per-source window.
    */
  def domainCapTokens(docs: DataFrame, budget: Long = 800): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      tokens(col("text")).as("n_tokens"),
      Dedup.hash32(col("doc_id").cast("string")).as("h"))
    Scan.withRunningTotal(toks, Seq("source"), Seq("h", "doc_id"), "n_tokens")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"),
        (col("cum_before") < budget).as("keep"))
  }

  /** Deterministic GLOBAL training-order shuffle: the reproducible
    * permutation a trainer consumes the corpus in — "shuffle the corpus
    * for epoch k" as a pure function of the data. Position = rank of the
    * portable hash h32(doc_id ‖ ':' ‖ seed) (ties → doc_id), so changing
    * `seed` reshuffles every epoch while the same (corpus, seed) yields
    * the SAME order on any engine or partitioning — the property
    * `rand()`-based shuffles lose the moment a partition moves.
    *
    * Scale design: the global rank is the distributed two-pass
    * [[Scan.withRunningTotal]] with value 1 and NO group — a global
    * row_number whose sort is a range shuffle across ALL partitions,
    * never the single-task `row_number() OVER (ORDER BY …)` window that
    * serializes a corpus-scale sort onto one executor. Emits
    * (doc_id, h, shuffle_pos) with shuffle_pos 0-based.
    */
  /** SNAPSHOT DIFF — the nightly ingest report between two corpus
    * snapshots: per (source, status) counts where status is
    * added / removed / changed / unchanged, membership keyed by doc_id
    * and "changed" decided by the md5 content identity (the dedup_exact
    * convention — byte identity, not similarity; near-dup movement is
    * [[graft.ops.Dedup.incrementalDedup]]'s job). The per-source ledger
    * is what a crawl operator reads before promoting a snapshot: a
    * source suddenly 90% "removed" is a feed outage, 90% "changed" is a
    * template re-render (both invisible in row counts alone).
    *
    * Scale shape: each side is one map-only (doc_id, source, md5) pass;
    * the full-outer join is a single co-partitioned doc_id equi-join
    * (with snapshots bucketed by doc_id on disk — the layout the
    * engine's clusterWrite family provides — it is zero-shuffle); the
    * status decision is map-side CASE arithmetic and the output is a
    * (sources × 4)-row dim aggregation.
    */
  def corpusDiff(prior: DataFrame, today: DataFrame): DataFrame = {
    val p = prior.select(col("doc_id"), col("source").as("src_p"),
      md5(col("text").cast("binary")).as("h_p"))
    val t = today.select(col("doc_id"), col("source").as("src_t"),
      md5(col("text").cast("binary")).as("h_t"))
    p.join(t, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_t"), col("src_p")).as("source"),
        when(col("h_p").isNull, lit("added"))
          .when(col("h_t").isNull, lit("removed"))
          .when(col("h_p") =!= col("h_t"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
  }

  def corpusShuffle(docs: DataFrame, seed: String = "epoch0"): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      Dedup.hash32(concat(col("doc_id").cast("string"), lit(":" + seed)))
        .as("h"),
      lit(1L).as("one"))
    Scan.withRunningTotal(keyed, Seq(), Seq("h", "doc_id"), "one", "shuffle_pos")
      .select(col("doc_id"), col("h"), col("shuffle_pos"))
  }

  /** RAG-style chunking PLAN: each doc fans out into fixed-`size` token
    * windows advancing by `size − overlap` (the standard overlapped
    * retrieval chunker), the last window clamped to the doc end — one
    * output row per chunk to cut: (doc_id, chunk_idx, tok_start,
    * tok_end, n_tokens). The text counterpart of
    * `multimodal_framesample`: the explode IS the distributed planning
    * step that fans a corpus into per-chunk work items for an
    * embedding/indexing fleet, partitioned like any other rows.
    * Pure integer arithmetic (exact in any engine), map-only.
    */
  def chunkPlan(docs: DataFrame, size: Int = 128, overlap: Int = 32): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"invalid chunking ($size, $overlap)")
    val stride = size - overlap
    val t = tokens(col("text"))
    docs.select(col("doc_id"), t.as("n_tokens"))
      .withColumn("n_chunks", when(col("n_tokens") === 0L, 0L)
        .otherwise(lit(1L) +
          expr(s"(greatest(n_tokens - $size, 0) + ${stride - 1}) div $stride")))
      .where(col("n_chunks") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + size, col("n_tokens")).as("tok_end"))
  }

  /** Repetition score — the classic repeated-n-gram quality filter
    * (boilerplate/spam detectors): 1 - distinct/total 3-gram ratio per
    * doc (null for docs under 3 words). Pure map-only codegen.
    */
  def repetitionScore(docs: DataFrame): DataFrame =
    docs.withColumn("ws", words(col("text")))
      .withColumn("sh", Dedup.shinglesFromWords(col("ws")))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_trigrams"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct_trigrams"))
      .withColumn("repetition", when(col("n_trigrams") > 0,
        round(lit(1.0) - col("n_distinct_trigrams").cast("double") / col("n_trigrams"), 6)))

  /** Per-doc character-distribution Shannon entropy in bits/char — the
    * cheap gibberish/encoding-junk detector (natural prose sits ~4 bits;
    * base64 blobs and single-char spam sit far off). Entirely map-only
    * higher-order functions inside WholeStageCodegen: one split per row,
    * one array_sort, then ONE run-length-counting fold over the sorted
    * chars — O(n log n) per doc (a 10 MB wide-alphabet doc is fine; the
    * previous distinct×filter formulation was O(distinct · n)). Each
    * run's term −p·ln(p) is accumulated when the run CLOSES, i.e. in
    * sorted-distinct-char order — the same fixed association order as
    * before, so the floating sum is bit-identical and the oracle replays
    * it exactly (ln-based terms, one ln(2) division at the end). Zero
    * shuffle at any corpus scale.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    // −p·ln(p) term for a closed run of `run` identical chars
    def term(run: Column, n: Column) = {
      val p = run.cast("double") / n.cast("double")
      p * log(p)
    }
    docs.where(length(col("text")) > 0)
      // Java's split(pattern, -1) keeps a trailing empty match on an empty
      // pattern; DuckDB's string_split doesn't — drop it on our side
      .select(col("doc_id"),
        filter(split(col("text"), ""), x => x =!= "").as("cs"))
      .withColumn("n", size(col("cs")))
      .withColumn("st",
        aggregate(array_sort(col("cs")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("acc"),
            lit(0L).as("distinct")),
          (st, ch) => {
            val same = ch === st.getField("prev")
            struct(
              ch.as("prev"),
              when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
              // close the previous run on a char change
              when(same, st.getField("acc")).otherwise(
                when(st.getField("run") > 0L,
                  st.getField("acc") - term(st.getField("run"), col("n")))
                  .otherwise(st.getField("acc"))).as("acc"),
              when(same, st.getField("distinct"))
                .otherwise(st.getField("distinct") + 1L).as("distinct"))
          },
          // close the final run
          st => struct(
            when(st.getField("run") > 0L,
              st.getField("acc") - term(st.getField("run"), col("n")))
              .otherwise(st.getField("acc")).as("ent_nats"),
            st.getField("distinct").as("distinct"))))
      .select(col("doc_id"), col("n").cast("long").as("n_chars"),
        col("st.distinct").as("n_distinct_chars"),
        round(col("st.ent_nats") / log(lit(2.0)), 6).as("entropy_bits"))
  }

  /** Zipf's-law fit over the corpus's top-`topN` term frequencies:
    * least-squares slope/intercept of ln(freq) on ln(rank) — the classic
    * one-number naturalness check (natural language sits near slope −1;
    * template/boilerplate corpora flatten, spam steepens). The heavy part
    * is one (term) count shuffle + a TakeOrdered top-N (scale-safe, no
    * global sort); the fit runs on the N-row frame via ONE collected
    * sorted array and fixed-order `aggregate` folds — no unpartitioned
    * window, and the float sums have one association order the oracle
    * replays exactly.
    */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    val top = docs
      .select(explode(words(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(topN)
    val foldSum = (arr: Column) => aggregate(arr, lit(0.0), (acc, x) => acc + x)
    top
      .agg(sort_array(collect_list(struct((-col("freq")).as("nf"), col("term"),
        col("freq")))).as("arr"))
      .select(size(col("arr")).cast("long").as("n_terms"),
        transform(col("arr"), (e, i) => log((i + 1).cast("double"))).as("xs"),
        transform(col("arr"), e => log(e.getField("freq").cast("double"))).as("ys"),
        transform(col("arr"), (e, i) => log((i + 1).cast("double")) *
          log(e.getField("freq").cast("double"))).as("xys"),
        transform(col("arr"), (e, i) => log((i + 1).cast("double")) *
          log((i + 1).cast("double"))).as("x2s"))
      .select(col("n_terms"), col("n_terms").cast("double").as("nd"),
        foldSum(col("xs")).as("sx"), foldSum(col("ys")).as("sy"),
        foldSum(col("xys")).as("sxy"), foldSum(col("x2s")).as("sx2"))
      .withColumn("slope_raw",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
          (col("nd") * col("sx2") - col("sx") * col("sx")))
      .select(col("n_terms"),
        round(col("slope_raw"), 6).as("slope"),
        round((col("sy") - col("slope_raw") * col("sx")) / col("nd"), 6)
          .as("intercept"))
  }

  /** Vocabulary coverage curve — the tokenizer-budget question asked
    * before fixing a vocab size: what fraction of all corpus tokens do
    * the top-V types cover, for a ladder of candidate V? (The BPE cousin
    * of zipf_fit's naturalness check; OOV rate at budget V is
    * 1 − coverage.) One term-count shuffle + a TakeOrdered over the
    * largest budget (scale-safe: the candidate frame is max(vs) rows, no
    * global sort, no unpartitioned window) — then each budget's covered
    * count is a fixed-order integer fold over ONE collected sorted array
    * (the zipf_fit idiom), so every number is an exact BIGINT any engine
    * replays. Ties at the cut rank break by term asc, pinned by the same
    * sort both engines run.
    */
  def vocabCoverage(docs: DataFrame, vs: Seq[Int] = Seq(16, 64, 256, 1024)): DataFrame = {
    val terms = graft.core.Materialize.once(
      docs.select(explode(words(col("text"))).as("term"))
        .where(col("term") =!= ""))
    val total = terms.agg(count(lit(1)).as("total_tokens"))
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(vs.max)
    val arr = top.agg(sort_array(collect_list(
      struct((-col("freq")).as("nf"), col("term"), col("freq")))).as("arr"))
    val budgets = docs.sparkSession.createDataFrame(
      vs.sorted.map(v => Tuple1(v.toLong))).toDF("v")
    budgets.crossJoin(broadcast(arr)).crossJoin(broadcast(total))
      .select(col("v"),
        least(col("v"), size(col("arr")).cast("long")).as("n_types"),
        aggregate(slice(col("arr"), lit(1),
          least(col("v"), size(col("arr")).cast("long")).cast("int")),
          lit(0L), (acc, e) => acc + e.getField("freq")).as("covered_tokens"),
        col("total_tokens"))
      .withColumn("coverage",
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6))
  }

  /** Corpus heavy hitters via the MERGEABLE Misra–Gries sketch
    * (functions.MisraGries): map tasks shrink their partitions to ≤ k−1
    * counters before the shuffle — the sketch path for "top boilerplate
    * tokens over 100 TB" where exact term counts would shuffle the whole
    * vocabulary. Estimates are merge-order-dependent (inherent to MG), so
    * the oracled surface is the GUARANTEE: for every term with true
    * frequency > n/k, the sketch contains it (`found`) with
    * true − n/k ≤ estimate ≤ true (`bounds_ok`) — both provably always
    * true, checked per true-heavy term (the approx_distinct pattern).
    * The exact side exists for the contract only; the operator a 100 TB
    * job runs is the one-row sketch aggregation.
    */
  def heavyHitters(docs: DataFrame, k: Int = 32): DataFrame = {
    val terms = graft.core.Materialize.once(
      docs.select(explode(words(col("text"))).as("term"))
        .where(col("term") =!= ""))
    val sketch = sketchOfTerms(terms, k)
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val tot = terms.agg(count(lit(1)).as("n"))
    val est = element_at(col("mg"), col("term"))
    exact.crossJoin(broadcast(tot))
      .where(col("freq") > col("n") / k)
      .crossJoin(broadcast(sketch))
      .select(col("term"), col("freq"),
        est.isNotNull.as("found"),
        (coalesce(est, lit(0L)) <= col("freq") &&
          coalesce(est, lit(0L)).cast("double") >=
            col("freq") - col("n") / k).as("bounds_ok"))
  }

  /** The sketch-only heavy-hitters entry point — what a 100 TB job calls.
    * One row, one `mg` map column of ≤ k−1 (term → estimate) counters;
    * shuffle volume is O(k · partitions) (each map task ships one ≤(k−1)-
    * entry summary to a single reducer), NOT the full-vocabulary shuffle
    * the exact side of [[heavyHitters]] pays. That oracled query remains
    * the verification harness for this operator's guarantee.
    */
  def heavyHittersSketch(docs: DataFrame, k: Int = 32): DataFrame =
    sketchOfTerms(
      docs.select(explode(words(col("text"))).as("term"))
        .where(col("term") =!= ""), k)

  private def sketchOfTerms(terms: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = udaf(new graft.functions.MisraGries(k), ExpressionEncoder[String]())
    terms.agg(agg(col("term")).as("mg"))
  }

  /** Train/test decontamination as a TRANSFORM (contaminationCheck is the
    * report): drops corpus docs whose benchmark shingle containment
    * reaches `threshold`, keeping zero-hit and sub-shingle docs. Same
    * broadcast-semi-join shape as the check — no corpus-sized shuffle —
    * and the kept rows carry their evidence columns for lineage.
    */
  def decontaminate(docs: DataFrame, benchmarkSource: String = "src0",
                    threshold: Double = 0.5): DataFrame =
    contaminationCheck(docs, benchmarkSource, threshold)
      .where(!coalesce(col("contaminated"), lit(false)))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"), col("containment"))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * log p̂_target(doc) − log q̂_raw(doc) under HASHED unigram bag models —
    * the standard cheap way to tilt a giant crawl toward a target domain
    * (sample ∝ exp(weight) downstream; `budget_sample`/`corpus_sample`
    * are the engine's sampling side). Features are word tokens hashed
    * into `buckets` bins with the portable md5-prefix hash32 (the oracle
    * replays end to end); both models are add-one-smoothed bucket
    * distributions: p_b = (tc_b+1)/(T+B), q_b = (rc_b+1)/(R+B).
    *
    * Determinism: each bucket's log-ratio ln(p_b) − ln(q_b) is computed
    * ONCE on the bounded feature table (two double divisions of exact
    * longs, two shared-libm ln — the zipf precedent), rounded to 12 and
    * cast DECIMAL(28,12) (the amihud/psi recipe); per-document weights
    * are EXACT decimal sums of those terms, emitted as the (identical in
    * any engine) double of the exact decimal, UNROUNDED — and the
    * per-token mean is one further double division, also unrounded (the
    * realized_jump convention; a final engine round() could tie at the
    * half-micro since scale-12 decimals terminate).
    *
    * Scale shape: ONE token explode over the corpus, cut once — it feeds
    * the target counts, the raw counts, and the per-doc sum; the feature
    * table is bounded by `buckets` (8192 default) so it BROADCASTS back
    * onto the token stream; totals are 1-row broadcast crosses; the
    * per-doc reduction is map-side combined. Nothing here is ever
    * corpus × corpus.
    */
  def dsirWeights(docs: DataFrame, targetPred: Column,
                  buckets: Int = 8192): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    val toks = graft.core.Materialize.once(
      docs.select(col("doc_id"), targetPred.as("is_target"),
        explode(words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .select(col("doc_id"), col("is_target"),
          (Dedup.hash32(col("w")) % lit(buckets.toLong)).as("b")))
    val rc = toks.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tc = toks.where(col("is_target")).groupBy(col("b"))
      .agg(count(lit(1)).as("tc"))
    val totals = toks.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_total"),
      count(lit(1)).as("r_total"))
    val feat = rc.join(tc, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(
          log((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double") /
            (col("t_total") + lit(buckets.toLong)).cast("double")) -
          log((col("rc") + lit(1L)).cast("double") /
            (col("r_total") + lit(buckets.toLong)).cast("double")), 12)
          .cast(DecimalType(28, 12)).as("lr"))
    toks.join(broadcast(feat), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        col("s").cast("double").as("dsir_logratio"),
        (col("s").cast("double") / col("n_tokens").cast("double"))
          .as("per_token"))
  }
}
