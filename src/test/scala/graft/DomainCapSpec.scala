package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Per-domain/source caps — the curation guard against one dominant crawl
  * domain swamping the mix. Pins the cap itself, the best-quality
  * selection, determinism under repartitioning, and the token-budget
  * flavor's straddle rule, on the sf0.001 documents (20 sources × 25
  * docs).
  */
class DomainCapSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("domainCap keeps at most cap docs per source, the best-scored ones") {
    val cap = 7
    val r = TextAnalysis.domainCap(docs, cap).cache()
    // decision column covers EVERY doc
    assert(r.count() == docs.count())
    val perSource = r.where(col("keep")).groupBy(col("source")).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(perSource.nonEmpty && perSource.values.forall(_ <= cap),
      s"cap violated: $perSource")
    // every source with >= cap docs fills its cap exactly
    assert(perSource.values.forall(_ == cap),
      s"sources with 25 docs must fill cap $cap: $perSource")
    // kept docs dominate dropped docs within each source: the max dropped
    // score never exceeds the min kept score (ties allowed — the heap
    // breaks them on doc_id)
    val worstKept = r.where(col("keep")).groupBy(col("source"))
      .agg(min(col("score")).as("worst_kept"))
    val bestDrop = r.where(!col("keep") && col("score").isNotNull)
      .groupBy(col("source")).agg(max(col("score")).as("best_drop"))
    val inverted = worstKept.join(bestDrop, Seq("source"))
      .where(col("best_drop") > col("worst_kept")).count()
    assert(inverted == 0L, "a dropped doc outscored a kept doc")
    r.unpersist()
  }

  test("domainCap is deterministic under repartitioning") {
    val a = TextAnalysis.domainCap(docs, 5)
      .orderBy(col("doc_id")).collect().toSeq
    val b = TextAnalysis.domainCap(docs.repartition(17, col("doc_id")), 5)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b, "keep decisions changed with partitioning")
  }

  test("domainCap: null-score docs are never kept") {
    val withEmpty = docs.limit(20)
      .unionByName(docs.limit(1).select(lit(990001L).as("doc_id"),
        lit("").as("text"), lit("xx").as("lang"), lit("srcX").as("source"),
        lit(0L).as("n_chars")))
    val r = TextAnalysis.domainCap(withEmpty, 5)
    val empty = r.where(col("doc_id") === 990001L).collect()
    assert(empty.length == 1 && !empty.head.getAs[Boolean]("keep"))
  }

  test("domainCapTokens enforces the budget with the straddle rule") {
    val budget = 300L
    val r = TextAnalysis.domainCapTokens(docs, budget).cache()
    // every kept doc STARTS inside the budget; every dropped doc doesn't
    val badKeep = r.where(col("keep") && col("cum_before") >= budget).count()
    val badDrop = r.where(!col("keep") && col("cum_before") < budget).count()
    assert(badKeep == 0L && badDrop == 0L)
    // a source with enough mass reaches (and may straddle past) budget;
    // kept token mass is >= budget whenever the source has the mass
    val keptMass = r.groupBy(col("source")).agg(
      sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("kept"),
      sum(col("n_tokens")).as("total")).collect()
    keptMass.foreach { row =>
      val (kept, total) = (row.getLong(1), row.getLong(2))
      if (total >= budget) assert(kept >= budget,
        s"source ${row.getString(0)} under-filled: $kept of $total")
      else assert(kept == total, "under-budget source must keep everything")
    }
    r.unpersist()
  }
}
