package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live PER-DOMAIN ADMISSION — the streaming face of the domain-cap
  * family (`TextAnalysis.domainCap` / `domainCapTokens`): documents
  * arrive on a stream and each SOURCE admits at most `cap` docs (and,
  * optionally, only docs that START inside its running `tokenBudget` —
  * the batch straddle rule). The gatekeeper of an always-on crawl
  * pipeline: once a domain fills its cap, later arrivals come back
  * keep = false but still carry their position (n_before, cum_before)
  * for audit.
  *
  * Contract difference vs the batch operator, stated plainly: batch
  * `domainCap` owns the whole corpus and keeps each source's
  * BEST-quality docs; a stream cannot see the future, so admission is
  * ARRIVAL-ordered (micro-batch sequence first, deterministic
  * (hash, doc_id) order within each micro-batch — the budgetSample
  * ordering contract). The token flavor therefore equals batch
  * `domainCapTokens` on a single-batch stream row-for-row and conserves
  * running totals across any batch split (spec-pinned); the doc-count
  * flavor is the arrival-ordered admission policy.
  *
  * Scale design: state per source is TWO longs (docs admitted,
  * cumulative tokens) — sources are dim-scale (domains, not docs); no
  * TTL; per-batch work is map-only plus the dim-scale keyed state pass.
  */
object StreamingDomainCap {

  case class DocTok(doc_id: Long, source: String, n_tokens: Long, h: Long)
  case class Admit(doc_id: Long, source: String, n_tokens: Long,
                   n_before: Long, cum_before: Long, keep: Boolean)

  /** Admission state: docs admitted and tokens started so far. */
  case class SrcState(n: Long, cum: Long)

  /** `cap` bounds admitted DOCS per source; `tokenBudget` (Long.MaxValue
    * = unbounded) additionally applies the budgetSample straddle rule on
    * tokens. A doc is admitted iff BOTH bounds hold at its arrival.
    *
    * The token counter advances for EVERY arrival (the batch "doc STARTS
    * inside the budget" rule — cum_before is the position in the full
    * arrival stream, so with cap = ∞ a single-batch stream equals batch
    * `domainCapTokens` row-for-row); the doc counter advances only on
    * admission (a capped-out domain's rejects don't consume doc slots).
    */
  def run(docs: DataFrame, cap: Long = 15,
          tokenBudget: Long = Long.MaxValue): Dataset[Admit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"),
        graft.ops.TextAnalysis.tokens(col("text")).as("n_tokens"),
        graft.ops.Dedup.hash32(col("doc_id").cast("string")).as("h"))
      .as[DocTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[DocTok], state: GroupState[SrcState]) => {
          var st = state.getOption.getOrElse(SrcState(0L, 0L))
          val out = rows.toSeq.sortBy(d => (d.h, d.doc_id)).map { d =>
            val keep = st.n < cap && st.cum < tokenBudget
            val a = Admit(d.doc_id, source, d.n_tokens, st.n, st.cum, keep)
            st = SrcState(if (keep) st.n + 1L else st.n, st.cum + d.n_tokens)
            a
          }
          state.update(st)
          out.iterator
        })
  }
}
