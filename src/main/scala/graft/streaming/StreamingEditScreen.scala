package graft.streaming

import graft.ops.Fuzzy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live fuzzy-identity screening: streaming short identity strings
  * (names, titles, SKUs, URLs) checked against a STATIC dictionary
  * snapshot within k edits — the serving face of `Fuzzy.editJoin`, and
  * the string sibling of [[StreamingDhashScreen]] (the same corner of
  * the dedup matrix: stream-vs-static stateless screening).
  *
  * Scale design: completely STATELESS (no watermark, no state store,
  * plain append mode). The dictionary explodes into its
  * deletion-neighborhood rows — ~(L+1)·|dict| rows at k=1, a BROADCAST
  * build side (a dimension input, fixed per snapshot); arrivals explode
  * map-only and candidates verify with the codegen'd threshold-bounded
  * levenshtein. A pair sharing several deletion signatures would hit
  * the join once per shared signature; the emit-once guard keeps only
  * the row whose signature IS the pair's smallest shared signature —
  * recomputed from the two carried strings, pure column logic,
  * exactly-once per (arrival, dictionary) pair with no dedup state.
  *
  * Emits (id, ts, dict_id, dist) for every dictionary neighbor within
  * k edits; an arrival with no emission is a NEW identity by absence
  * (the StreamingSemanticScreen contract).
  */
object StreamingEditScreen {

  /** `stream`: streaming (id, ts, s); `dict`: static (id, s). k ∈ {1, 2}.
    * Over-`maxLen` strings raise loudly on BOTH sides (the
    * [[Fuzzy.guarded]] contract) — a live screen fed long text is the
    * same silent fan-out misuse as the batch join.
    */
  def run(stream: DataFrame, dict: DataFrame, k: Int = 1,
      maxLen: Int = Fuzzy.DefaultMaxLen): DataFrame = {
    require(k >= 1 && k <= 2, "k in {1, 2}")
    val dsig = dict.select(col("id").as("dict_id"),
        Fuzzy.guarded(col("s"), maxLen).as("ds"))
      .select(col("dict_id"), col("ds"),
        explode(Fuzzy.neighborhood(col("ds"), k)).as("sig"))
    stream.select(col("id"), col("ts"),
        Fuzzy.guarded(col("s"), maxLen).as("s"))
      .select(col("id"), col("ts"), col("s"),
        explode(Fuzzy.neighborhood(col("s"), k)).as("sig"))
      .join(broadcast(dsig), Seq("sig"))
      .withColumn("dist", levenshtein(col("s"), col("ds"), k).cast("long"))
      .where(col("dist") >= 0 &&
        col("sig") === array_min(array_intersect(
          Fuzzy.neighborhood(col("s"), k), Fuzzy.neighborhood(col("ds"), k))))
      .select(col("id"), col("ts"), col("dict_id"), col("dist"))
  }
}
