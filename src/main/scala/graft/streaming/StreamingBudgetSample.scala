package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-language token-budget ADMISSION — the streaming sibling of
  * `TextAnalysis.budgetSample`: documents arrive on a stream and each
  * language admits (keep = true) exactly the docs that START inside its
  * running `budget` (the batch straddle rule). Use it as the gatekeeper
  * of an always-on ingestion pipeline: once a language's budget fills,
  * its later arrivals come back keep = false but still carry their
  * cum_before position for audit.
  *
  * Ordering contract: the batch operator owns a fixed corpus and orders
  * by the deterministic content hash; a stream's order IS arrival —
  * micro-batch sequence first, the same (hash, doc_id) order within each
  * micro-batch. A single-batch stream therefore equals the batch
  * operator row-for-row, and any batch split of the same arrival
  * sequence conserves the per-language running totals (both
  * spec-pinned).
  *
  * Scale design: state per language is ONE long (the cumulative token
  * count) — languages are dim-scale, no TTL needed; token counting is
  * the shared `TextAnalysis.tokens` expression (one null convention with
  * the whole mix family); per-batch work is map-only plus the dim-scale
  * keyed state pass.
  */
object StreamingBudgetSample {

  case class DocTok(doc_id: Long, lang: String, n_tokens: Long, h: Long)
  case class Admit(doc_id: Long, lang: String, n_tokens: Long,
                   cum_before: Long, keep: Boolean)

  def run(docs: DataFrame, budget: Long = 20000): Dataset[Admit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"),
        graft.ops.TextAnalysis.tokens(col("text")).as("n_tokens"),
        graft.ops.Dedup.hash32(col("doc_id").cast("string")).as("h"))
      .as[DocTok]
      .groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (lang: String, rows: Iterator[DocTok], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(d => (d.h, d.doc_id)).map { d =>
            val a = Admit(d.doc_id, lang, d.n_tokens, cum, cum < budget)
            cum += d.n_tokens
            a
          }
          state.update(cum)
          out.iterator
        })
  }
}
