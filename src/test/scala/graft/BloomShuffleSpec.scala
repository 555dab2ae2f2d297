package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Bloom-screened incremental dedup + deterministic corpus shuffle — the
  * two round-10 pipeline additions. Pins: exact-result equivalence with
  * the anti-join semantics, the no-false-negative invariant (is_dup ⇒
  * screened), a bounded screen false-positive rate, permutation
  * correctness, partitioning invariance, and per-seed reshuffling, on the
  * sf0.001 documents.
  */
class BloomShuffleSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val batch = docs.where(col("source") === "src0")
  private lazy val corpus = docs.where(col("source") =!= "src0")

  test("bloomScreenDedup matches exact anti-join semantics, no false negatives") {
    val r = Dedup.bloomScreenDedup(batch, corpus).cache()
    assert(r.count() == batch.count(), "one decision row per batch doc")
    val cH = corpus.select(Dedup.hash60(col("text")).as("h")).distinct()
    val expected = batch
      .select(col("doc_id"), Dedup.hash60(col("text")).as("h"))
      .join(cH.withColumn("d", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("d"), lit(false)).as("exp"))
    val wrong = r.join(expected, "doc_id")
      .where(col("is_dup") =!= col("exp")).count()
    assert(wrong == 0L, s"$wrong docs disagree with the exact join")
    // the Bloom no-false-negative law: every true dup was a candidate
    assert(r.where(col("is_dup") && !col("screened")).count() == 0L)
    r.unpersist()
  }

  test("bloomScreenDedup flags planted duplicates and passes fresh docs") {
    val fake = corpus.limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    assert(Dedup.bloomScreenDedup(fake, corpus)
      .where(col("is_dup")).count() == 5L, "planted copies must be dups")
    val fresh = batch.select(col("doc_id"),
      concat(lit("entirely novel prefix "), col("text")).as("text"))
    assert(Dedup.bloomScreenDedup(fresh, corpus)
      .where(col("is_dup")).count() == 0L, "perturbed docs must be novel")
  }

  test("bloomScreenDedup screen FPR stays near the configured fpp") {
    val r = Dedup.bloomScreenDedup(batch, corpus, fpp = 0.01)
    val novel = r.where(!col("is_dup")).cache()
    val n = novel.count()
    val falsePos = novel.where(col("screened")).count()
    // fpp=1% on a small batch: allow generous slack but catch a broken
    // screen (screened-everything would be n)
    assert(falsePos <= math.max(5L, n / 10),
      s"screen false positives $falsePos of $n novel docs")
    novel.unpersist()
  }

  test("corpusShuffle emits an exact permutation 0..n-1") {
    val r = TextAnalysis.corpusShuffle(docs).cache()
    val n = docs.count()
    assert(r.count() == n)
    assert(r.select(col("shuffle_pos")).distinct().count() == n,
      "positions must be unique")
    val mm = r.agg(min(col("shuffle_pos")), max(col("shuffle_pos"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == n - 1)
    r.unpersist()
  }

  test("corpusShuffle equals the window-rank reference and ignores partitioning") {
    val a = TextAnalysis.corpusShuffle(docs)
      .orderBy(col("shuffle_pos")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val b = TextAnalysis.corpusShuffle(docs.repartition(13, col("doc_id")))
      .orderBy(col("shuffle_pos")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "order changed with input partitioning")
    // the (single-partition) window reference — fine at spec scale only
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h"), col("doc_id"))
    val ref = docs.select(col("doc_id"),
        Dedup.hash32(concat(col("doc_id").cast("string"), lit(":epoch0")))
          .as("h"))
      .withColumn("p", row_number().over(w).cast("long") - 1L)
      .orderBy(col("p")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == ref, "two-pass scan disagrees with the window reference")
  }

  test("corpusShuffle reshuffles under a different seed") {
    val a = TextAnalysis.corpusShuffle(docs, "epoch0")
      .select(col("doc_id"), col("shuffle_pos").as("p0"))
    val b = TextAnalysis.corpusShuffle(docs, "epoch1")
      .select(col("doc_id"), col("shuffle_pos").as("p1"))
    val moved = a.join(b, "doc_id").where(col("p0") =!= col("p1")).count()
    assert(moved > docs.count() / 2,
      s"only $moved docs moved between epochs — seed not mixing")
  }
}
