package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantified recall floor for the oversized-bucket LSH cap (r4 verdict
  * task #6; scheme upgraded round 7): when a bucket exceeds `maxBucket`,
  * members pair with `numReps` HASH-SAMPLED representatives plus their
  * doc_id ring successors at strides 1 and 2 — O(m·numReps + 2m) pairs
  * instead of O(m²). This suite MEASURES what that costs in the
  * adversarial case the Dedup scaladoc warns about: one oversized
  * bucket MIXING several distinct near-dup clusters. The content-hash
  * rep sample is the load-bearing piece: an id-interleaving adversary
  * (which defeats min-id reps and every fixed ring stride) cannot bias
  * it, and one same-cluster rep hub reunites a whole cluster through
  * verify + connected components. A cluster holding fraction f of the
  * bucket is missed by all reps with probability (1−f)^numReps — the
  * documented knob.
  *
  * Construction: synthetic 128-long signatures, 16 bands × 8 rows.
  * Band 0 is identical across ALL 30 docs (3 clusters × 10) — the mixed
  * oversized bucket; every other band carries one doc-unique value, so
  * no other band buckets anything. Within-cluster signatures agree on
  * 113/128 positions (est 0.8828 ≥ 0.8); cross-cluster on 8/128.
  *
  * Measured floors (asserted exactly — the construction is
  * deterministic; recorded in SURVEY §4; previous single-rep scheme in
  * parentheses):
  *  - ids CONTIGUOUS by cluster: candidate pair recall 89/135 ≈ 0.66
  *    (was 35/135), post-verify connected components recover ALL 135
  *    truth pairs — cluster recall 1.0 (unchanged).
  *  - ids INTERLEAVED across clusters (the case that broke single-rep):
  *    candidate pair recall 61/135 ≈ 0.45 (was 9/135 ≈ 0.067), and the
  *    hash-sampled reps cover ALL THREE clusters, so
  *    verification+clustering recovers ALL 135 truth pairs — cluster
  *    recall 1.0 (was 45/135 ≈ 0.333). Remaining knobs: numReps (miss
  *    probability (1−f)^numReps), maxBucket, band count.
  */
class LshRecallSpecs extends SparkSpec {
  import spark.implicits._

  private val NumPerm = 128
  private val Bands = 16
  private val Rows = NumPerm / Bands // 8
  private val MaxBucket = 5
  private val PerCluster = 10
  private val NClusters = 3

  /** Signature for doc `id` in cluster `c`: band 0 shared corpus-wide,
    * bands 1..15 = one doc-unique position + 7 cluster-shared positions.
    */
  private def sig(id: Long, c: Int): Seq[Long] =
    (0 until NumPerm).map { p =>
      val band = p / Rows
      if (band == 0) 999L // the mixed oversized bucket
      else if (p % Rows == 0) 1000000L + id * 16L + band // doc-unique
      else 1000L * c + band // cluster-shared
    }

  private def sigsDf(clusterOf: Int => Int): DataFrame =
    (0 until NClusters * PerCluster)
      .map(i => (i.toLong, sig(i.toLong, clusterOf(i))))
      .toDF("doc_id", "sig")

  private def truthPairs(clusterOf: Int => Int): Set[(Long, Long)] =
    (for {
      i <- 0 until NClusters * PerCluster
      j <- i + 1 until NClusters * PerCluster
      if clusterOf(i) == clusterOf(j)
    } yield (i.toLong, j.toLong)).toSet

  private def run(clusterOf: Int => Int): (Set[(Long, Long)], Set[(Long, Long)], Set[(Long, Long)]) = {
    val truth = truthPairs(clusterOf)
    val cand = Dedup.minhashLshFromSigs(sigsDf(clusterOf), NumPerm, Bands, MaxBucket)
    val candPairs = cand.select(col("id1"), col("id2"))
      .as[(Long, Long)].collect().toSet
    // verify stage: keep candidates at/above the near-dup threshold, then
    // reunite via connected components (the corpusDedup flow)
    val verified = cand.where(col("est_jaccard") >= 0.8)
      .select(col("id1"), col("id2"))
    val labels = Dedup.clusters(verified)
      .as[(Long, Long)].collect().toMap
    val recovered = truth.filter { case (a, b) =>
      labels.get(a).exists(la => labels.get(b).contains(la))
    }
    graft.core.Materialize.releaseAll(spark, blocking = true)
    (truth, candPairs, recovered)
  }

  test("sanity: the construction yields ONE oversized mixed bucket and clean est tiers") {
    val df = sigsDf(_ / PerCluster)
    // within-cluster est = 113/128, cross-cluster = 8/128 — both exact
    val est = Dedup.minhashLshFromSigs(df, NumPerm, Bands, MaxBucket)
      .select(col("est_jaccard")).as[Double].collect()
    assert(est.nonEmpty)
    assert(est.forall(e => e == 113.0 / 128 || e == 8.0 / 128),
      s"unexpected est tier: ${est.distinct.mkString(",")}")
  }

  test("contiguous ids: pair recall 89/135, cluster-level recall 1.0") {
    val (truth, cand, recovered) = run(_ / PerCluster)
    assert(truth.size == 135)
    val hit = cand.intersect(truth)
    assert(hit.size == 89, s"expected 89 true candidate pairs, got ${hit.size}")
    assert(recovered == truth,
      "connected components must reunite every cluster when rings stay within clusters")
  }

  test("interleaved ids (adversarial): hash-sampled reps restore cluster recall 1.0") {
    val (truth, cand, recovered) = run(_ % NClusters)
    assert(truth.size == 135)
    val hit = cand.intersect(truth)
    assert(hit.size == 61, s"expected 61 true candidate pairs, got ${hit.size}")
    // every cluster drew at least one hash-sampled rep hub -> CC
    // reunites all three clusters completely
    assert(recovered == truth,
      s"expected full cluster recovery, got ${recovered.size}/135")
  }

  test("below the cap the same corpus gets full all-pairs recall") {
    val truth = truthPairs(_ % NClusters)
    val cand = Dedup.minhashLshFromSigs(sigsDf(_ % NClusters), NumPerm, Bands,
      maxBucket = 30) // cap not hit: the bucket of 30 pairs all-pairs
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    graft.core.Materialize.releaseAll(spark, blocking = true)
    assert(truth.subsetOf(cand),
      "with the bucket within the cap, every truth pair must be a candidate")
  }
}
