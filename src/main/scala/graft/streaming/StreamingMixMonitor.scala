package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live training-mix dashboard — the streaming sibling of the batch
  * `mix_report`: running docs/tokens per (lang, source) cell over an
  * arriving document stream, update mode.
  *
  * Scale design: this is a plain streaming aggregation whose STATE is
  * the dim-scale cell table itself (languages × sources — the same
  * cardinality assumption mix_report makes), so the state store holds a
  * few counters per cell regardless of stream volume; the token count is
  * the SHARED TextAnalysis.tokens expression (one null convention across
  * the whole mix family — null text counts 0 under any ANSI/sizeOfNull
  * conf), and counts and token sums are exact longs, so at stream end
  * the monitor equals the batch rollup over the same documents
  * regardless of micro-batch boundaries or replay order (spec-pinned).
  * Feed `mix_rebalance` / mix planning from the latest snapshot.
  */
object StreamingMixMonitor {

  def run(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("source"),
        graft.ops.TextAnalysis.tokens(col("text")).as("t"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("total_tokens"))
}
