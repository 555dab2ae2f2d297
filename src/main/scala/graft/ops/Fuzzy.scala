package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance similarity join — the entity-resolution /
  * catalog-reconciliation primitive none of the token-set families
  * cover: `ngram_jaccard` and minhash measure SET overlap, so a
  * one-character typo in a short identifier ("Supplier#...001" vs
  * "...002") scores near-zero Jaccard yet is edit distance 1. This
  * family answers "which string pairs are within k edits" without ever
  * forming the cross product.
  *
  * Candidate generation is the FastSS deletion-neighborhood argument
  * (Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries"):
  * if ED(s, t) ≤ k, the sets of strings reachable from s and from t by
  * at most k single-character deletions intersect — so an equi-join on
  * neighborhood members finds every true pair, and a codegen'd
  * threshold-bounded Levenshtein verify (the banded DP stops at k)
  * removes the false ones. Exact: necessity gives no false negatives,
  * the verify kills false positives.
  *
  * Scale shape: the neighborhood is map-only, (L choose ≤k) ≈ L^k rows
  * per string of length L (the documented fan-out knob — built for the
  * SHORT-string identity columns: names, titles, URLs, SKUs); the only
  * shuffle is the equi-join on the deletion key; candidate pairs are
  * bounded by bucket sizes, and a hot deletion key IS a near-identical
  * cluster — the answer, not noise (the simhash bucket argument).
  * Verify is whole-stage-codegen `levenshtein(s, t, k)` with early
  * exit. No UDF, no cross join, no window.
  */
object Fuzzy {

  /** The documented input contract: the L^k fan-out is priced for SHORT
    * identity columns. Callers raise LOUDLY past this unless they widen
    * it explicitly — the packed-key-headroom convention (see
    * [[Dedup.packKey20]]): a silent fan-out explosion at 100 TB is an
    * executor-OOM storm nobody attributes, not an edge case.
    */
  val DefaultMaxLen = 64

  /** All strings formed by deleting exactly one character of `s`.
    * Explicit empty guard: without it `sequence(1, 0)` produces Spark's
    * DESCENDING [1, 0] and correctness would rest on negative-length
    * `substr` collapsing the junk — two non-obvious engine behaviors
    * (the shinglesFromWords guard convention).
    */
  private[graft] def deletions(s: Column): Column =
    when(coalesce(length(s), lit(0)) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)),
        i => concat(substr(s, lit(1), i - 1), substr(s, i + 1, length(s)))))

  /** LOUD length-contract guard on the neighborhood input: raises per-row
    * when `s` is longer than `maxLen` chars (a 10 KB string at k=2 is
    * ~10⁸ neighborhood rows PER ROW — silent misuse, not data). NULLs
    * pass through untouched (they explode to zero signature rows — the
    * null-dirt robustness contract); the success-null of `assert_true`
    * folds back into the string via coalesce, one codegen branch per row.
    */
  private[graft] def guarded(s: Column, maxLen: Int): Column = {
    val guard = assert_true(coalesce(length(s), lit(0)) <= lit(maxLen),
      concat(lit("editJoin input exceeds maxLen=" + maxLen +
          " chars (the deletion-neighborhood fan-out is priced for short" +
          " identity columns; pass maxLen explicitly to widen): length="),
        length(s).cast("string"), lit(" s="), substring(s, 1, 40)))
    coalesce(guard.cast("string"), s)
  }

  /** The ≤k-deletion neighborhood of `s` (k ∈ {1, 2}), duplicates
    * removed map-side so the explode fan-out is minimal.
    */
  private[graft] def neighborhood(s: Column, k: Int): Column = {
    val d1 = deletions(s)
    val all =
      if (k == 1) concat(array(s), d1)
      else concat(array(s), d1, flatten(transform(d1, d => deletions(d))))
    array_distinct(all)
  }

  /** Edit-distance-≤-k similarity join of a table with itself on
    * `strCol`, identities from `idCol`. Emits (id1 < id2, dist ≤ k)
    * distinct pairs. k ∈ {1, 2}. Strings longer than `maxLen` raise
    * loudly (see [[guarded]]); widen it deliberately, never implicitly.
    */
  def editJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int = 1, maxLen: Int = DefaultMaxLen): DataFrame =
    joinPairs(graft.core.Materialize.once(
      df.select(col(idCol).as("id"),
        guarded(col(strCol), maxLen).as("s"))), k)

  /** Pair kernel over an already-materialized (id, s) cut — ONE source
    * scan: both sides of the signature self-join read the cut; the
    * neighborhood explode recomputes per side (cheap codegen) rather
    * than storing the ×(L+1) fan-out. Two-step select: the lambda must
    * reference the child's column, not a lateral alias born in the same
    * projection.
    */
  private def joinPairs(base: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 2, "k in {1, 2}")
    val sig = base
      .select(col("id"), col("s"), explode(neighborhood(col("s"), k)).as("sig"))
    val cand = sig.join(
        sig.select(col("id").as("id2"), col("s").as("s2"), col("sig")),
        Seq("sig"))
      .where(col("id") < col("id2"))
      .select(col("id").as("id1"), col("s"), col("id2"), col("s2"))
      .distinct()
    cand
      .select(col("id1"), col("id2"),
        levenshtein(col("s"), col("s2"), k).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }

  /** Entity-resolution CLUSTERS over the [[editJoin]] pairs — the
    * canonicalization step a catalog/crawl pipeline runs after the
    * pair search: connected components over the ED-≤k graph (typo
    * chains are transitive in PRACTICE even though edit distance is
    * not — the standard ER convention, same as every dedup family
    * here), labels from the shared pointer-jumping
    * [[Dedup.clusters]], keeper = component min id (strings carry no
    * quality score; the replay-stable convention). Every input row
    * returns (singletons keep themselves). Emits
    * (id, s, cluster_id, keep).
    *
    * Scale shape: pairs inherit [[editJoin]]'s profile; CC is one
    * shuffle per round with pointer jumping (rounds ≤ log diameter);
    * the label join back is component-scale.
    */
  def editCluster(df: DataFrame, idCol: String, strCol: String,
      k: Int = 1, maxLen: Int = DefaultMaxLen): DataFrame = {
    val base = graft.core.Materialize.once(
      df.select(col(idCol).as("id"), guarded(col(strCol), maxLen).as("s")))
    val labels = Dedup.clusters(joinPairs(base, k))
    base.join(labels.select(col("doc_id").as("id"), col("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), col("s"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("id") === col("cluster_id"))
  }

  /** Reference semantics for [[editJoin]]: the all-pairs verify with no
    * candidate pruning. Spec-only (quadratic); the spec asserts set
    * equality against the FastSS path on adversarial inputs.
    */
  private[graft] def editJoinBrute(df: DataFrame, idCol: String,
      strCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(strCol).as("s"))
    val b = df.select(col(idCol).as("id2"), col(strCol).as("s2"))
    a.crossJoin(b).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        levenshtein(col("s"), col("s2"), k).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }
}
