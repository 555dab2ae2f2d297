package graft

import graft.ops.{Bm25, LogReg, Pca, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Independent quality gates for the model families that hash-exact
  * oracle parity cannot measure (the r14 lesson: the residual-PQ seeding
  * bug shipped 7 rounds with adc@5 = 0.000 because the DuckDB oracle
  * REPLAYS the same degenerate math — a replayed wrong answer matches
  * itself). Each gate here measures the model against ground truth the
  * model never saw: planted labels, planted eigenstructure, planted
  * relevance — so a silently-degenerate fit FAILS the build even while
  * every hash check stays green.
  *
  *  - LogReg: held-out accuracy/AUC floor on a separable synthetic
  *    corpus + a shuffled-label control pinned to the chance band (a
  *    model that "learns" label noise is memorizing, not generalizing).
  *  - PCA: component alignment + eigenvalue recovery on data generated
  *    from a PLANTED orthonormal basis with known variances, top
  *    eigenpair cross-checked against an INDEPENDENT driver-side power
  *    iteration (no Jacobi anywhere in the check), and reconstruction
  *    error at full planted rank ≈ 0 / at truncated rank ≈ the dropped
  *    variance mass.
  *  - BM25 / hybrid RRF: nDCG@10 floor on a planted-relevance corpus
  *    (graded gains the scorer never sees).
  *  - MMR: diversity actually measured — mean pairwise cosine of the
  *    MMR-selected set must drop hard vs the plain relevance top-k on a
  *    corpus of duplicated candidate clusters.
  *
  * Measured values for the round ledger are printed with a
  * `[quality]` prefix (collected into BENCH_NOTES).
  */
class ModelQualitySpec extends SparkSpec {
  import spark.implicits._

  // ---------- shared metric helpers (pure test-side math) ----------

  /** Rank-based AUC (Mann-Whitney): P(score_pos > score_neg) + ½ ties. */
  private def auc(scored: Seq[(Double, Boolean)]): Double = {
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    require(pos.nonEmpty && neg.nonEmpty, "degenerate AUC fixture")
    val wins = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    wins.sum / (pos.size.toLong * neg.size)
  }

  /** nDCG@k with 2^rel−1 gains against a planted relevance map. */
  private def ndcgAt(ranked: Seq[Long], rel: Map[Long, Int], k: Int): Double = {
    def dcg(gains: Seq[Int]): Double = gains.zipWithIndex.map {
      case (g, i) => (math.pow(2, g) - 1) / (math.log(i + 2) / math.log(2))
    }.sum
    val ideal = dcg(rel.values.toSeq.sorted.reverse.take(k))
    if (ideal == 0) 0.0 else dcg(ranked.take(k).map(rel.getOrElse(_, 0))) / ideal
  }

  // ---------- LogReg: held-out floor + shuffled-label control ----------

  // separable two-topic corpus: witness vocabularies per class + shared
  // noise, deterministic RNG — the fasttext-recipe shape LogReg targets
  private val PosVocab = Seq("aurora", "basalt", "cobalt", "dynamo", "ember")
  private val NegVocab = Seq("zephyr", "yonder", "willow", "vortex", "umbral")
  private val Noise = Seq("the", "of", "and", "data", "model", "run",
    "note", "with", "for", "over")

  private def classifierCorpus(shuffledLabels: Boolean)
      : Seq[(Long, String, Boolean)] = {
    val rnd = new scala.util.Random(20260816L)
    // control labels from an INDEPENDENT generator so they carry no
    // information about the text (drawn before the text tokens below)
    val ctlRnd = new scala.util.Random(777L)
    (0L until 400L).map { id =>
      val topicPos = id % 2 == 0
      val ctl = ctlRnd.nextBoolean()
      val vocab = if (topicPos) PosVocab else NegVocab
      val toks = Seq.fill(20)(Noise(rnd.nextInt(Noise.size))) ++
        Seq.fill(6)(vocab(rnd.nextInt(vocab.size)))
      (id, rnd.shuffle(toks).mkString(" "),
        if (shuffledLabels) ctl else topicPos)
    }
  }

  private def heldOutAuc(shuffledLabels: Boolean): (Double, Double) = {
    val all = classifierCorpus(shuffledLabels)
    // deterministic 80/20 split on doc_id — the corpus_split convention
    val train = all.filterNot(_._1 % 5 == 0).toDF("doc_id", "text", "y")
    val test = all.filter(_._1 % 5 == 0)
    val model = LogReg.train(train, col("y"), d = 256, epochs = 40)
    val scores = LogReg.score(test.toDF("doc_id", "text", "y"), model)
      .select(col("doc_id"), col("score"), col("pred")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val label = all.map(d => d._1 -> d._3).toMap
    val pairs = test.map(d => (scores(d._1)._1, label(d._1)))
    val acc = test.count(d => scores(d._1)._2 == label(d._1)).toDouble / test.size
    (auc(pairs), acc)
  }

  test("logreg quality gate: held-out AUC/accuracy floors on a separable " +
       "corpus; shuffled-label control sits in the chance band") {
    val (aucReal, accReal) = heldOutAuc(shuffledLabels = false)
    info(f"[quality] logreg held-out auc=$aucReal%.3f acc=$accReal%.3f")
    println(f"[quality] logreg held-out auc=$aucReal%.3f acc=$accReal%.3f")
    assert(aucReal >= 0.97,
      f"held-out AUC $aucReal%.3f below the 0.97 floor — the classifier " +
        "did not learn a cleanly separable corpus")
    assert(accReal >= 0.90,
      f"held-out accuracy $accReal%.3f below the 0.90 floor")

    val (aucCtl, accCtl) = heldOutAuc(shuffledLabels = true)
    println(f"[quality] logreg shuffled-label control auc=$aucCtl%.3f acc=$accCtl%.3f")
    assert(aucCtl > 0.30 && aucCtl < 0.70,
      f"shuffled-label control AUC $aucCtl%.3f outside the chance band " +
        "(0.30, 0.70) — the gate itself is leaking label information")
  }

  // ---------- PCA: planted eigenstructure + independent power check ----------

  // orthonormal Hadamard-type basis rows over d=8 (exact ±1/√8 entries)
  private val PcaD = 8
  private def hadamardRow(k: Int): Array[Double] = {
    val signs = k match {
      case 0 => Array(1, 1, 1, 1, 1, 1, 1, 1)
      case 1 => Array(1, -1, 1, -1, 1, -1, 1, -1)
      case 2 => Array(1, 1, -1, -1, 1, 1, -1, -1)
      case 3 => Array(1, -1, -1, 1, 1, -1, -1, 1)
    }
    signs.map(_ / math.sqrt(PcaD))
  }
  private val PlantedVars = Array(16.0, 9.0, 4.0, 1.0)

  private def plantedData(n: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(9090L)
    val basis = Array.tabulate(4)(hadamardRow)
    Array.fill(n) {
      val s = PlantedVars.map(v => rnd.nextGaussian() * math.sqrt(v))
      Array.tabulate(PcaD)(j =>
        0.5 + basis.indices.map(k => s(k) * basis(k)(j)).sum)
    }
  }

  test("pca quality gate: planted components recovered, eigenvalues within " +
       "sampling tolerance, top pair matches an independent power iteration") {
    val n = 500
    val data = plantedData(n)
    val emb = data.zipWithIndex.toSeq
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    val model = Pca.train(emb, k = 4)
    graft.core.Materialize.releaseAll(spark, blocking = true)

    // (a) component alignment with the planted basis — |cos| ≥ 0.97
    // (sample mixing between well-separated planted variances is
    // O(√(λiλj/n)/(λi−λj)) ≈ 0.08 rad at worst here)
    val aligns = (0 until 4).map { k =>
      math.abs(model.components(k).zip(hadamardRow(k)).map(t => t._1 * t._2).sum)
    }
    println(f"[quality] pca |align|=${aligns.map(a => f"$a%.4f").mkString(",")} " +
      f"eig=${model.eigenvalues.map(e => f"$e%.3f").mkString(",")}")
    aligns.zipWithIndex.foreach { case (a, k) =>
      assert(a >= 0.97, f"component $k aligns $a%.4f < 0.97 with its " +
        "planted direction — the eigendecomposition is off")
    }
    // (b) eigenvalue recovery: λ̂/λ within ±20% (≈3σ of the √(2/n) band)
    model.eigenvalues.zip(PlantedVars).zipWithIndex.foreach { case ((got, want), k) =>
      assert(math.abs(got - want) / want <= 0.20,
        f"eigenvalue $k: $got%.3f vs planted $want%.1f out of tolerance")
    }
    // (c) INDEPENDENT check — sample covariance + power iteration in pure
    // test code (no Jacobi, no Spark): top eigenpair must agree tightly
    val mean = Array.tabulate(PcaD)(j => data.map(_(j)).sum / n)
    val cov = Array.tabulate(PcaD, PcaD) { (i, j) =>
      data.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n
    }
    var v = Array.fill(PcaD)(1.0 / math.sqrt(PcaD))
    for (_ <- 1 to 300) {
      val w = cov.map(row => row.zip(v).map(t => t._1 * t._2).sum)
      val nm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nm)
    }
    val lam = v.zip(cov.map(row => row.zip(v).map(t => t._1 * t._2).sum))
      .map(t => t._1 * t._2).sum
    val dotTop = math.abs(model.components(0).zip(v).map(t => t._1 * t._2).sum)
    println(f"[quality] pca power-iteration cross-check dot=$dotTop%.6f " +
      f"lambda=$lam%.6f vs jacobi=${model.eigenvalues(0)}%.6f")
    assert(dotTop >= 0.9999, f"top component disagrees with power iteration ($dotTop%.6f)")
    assert(math.abs(lam - model.eigenvalues(0)) / lam <= 1e-6,
      "top eigenvalue disagrees with power iteration")

    // (d) reconstruction error: full planted rank (k=4) reconstructs the
    // rank-4 data to numerical zero; rank 2 leaves exactly the dropped
    // variance mass (planted 4 + 1 = 5, ± sampling)
    def reconResidual(k: Int): Double = {
      val proj = Pca.project(emb, model).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      graft.core.Materialize.releaseAll(spark, blocking = true)
      data.zipWithIndex.map { case (x, i) =>
        val p = proj(i.toLong)
        val xhat = Array.tabulate(PcaD) { j =>
          model.mean(j) + (0 until k).map(c => p(c) * model.components(c)(j)).sum
        }
        x.zip(xhat).map(t => math.pow(t._1 - t._2, 2)).sum
      }.sum / n
    }
    val rFull = reconResidual(4)
    val r2 = reconResidual(2)
    val dropped = model.eigenvalues(2) + model.eigenvalues(3)
    println(f"[quality] pca recon residual k=4: $rFull%.3e  k=2: $r2%.4f " +
      f"(dropped-variance prediction $dropped%.4f)")
    assert(rFull <= 1e-9, f"full-rank reconstruction residual $rFull%.3e not ≈ 0")
    assert(math.abs(r2 - dropped) / dropped <= 0.05,
      f"rank-2 residual $r2%.4f should equal the dropped variance $dropped%.4f")
  }

  // ---------- BM25 / hybrid RRF: planted-relevance nDCG floors ----------

  // planted graded relevance: 10 docs rel=2 (both terms, twice), 10 docs
  // rel=1 (one term once), 40 docs rel=0 (noise only)
  private val QTerms = Seq("quantum", "flux")
  private def plantedRel: Map[Long, Int] =
    ((0L to 9L).map(_ -> 2) ++ (10L to 19L).map(_ -> 1) ++
      (20L to 59L).map(_ -> 0)).toMap

  private def relevanceDocs: DataFrame = {
    val rnd = new scala.util.Random(4242L)
    val noise = Seq("lorem", "ipsum", "dolor", "amet", "consectetur",
      "adipiscing", "elit", "tempor")
    def pad(k: Int) = Seq.fill(k)(noise(rnd.nextInt(noise.size)))
    val rows =
      (0L to 9L).map { id =>
        (id, rnd.shuffle(Seq("quantum", "quantum", "flux", "flux") ++ pad(8)).mkString(" "))
      } ++ (10L to 19L).map { id =>
        val t = if (id % 2 == 0) "quantum" else "flux"
        (id, rnd.shuffle(t +: pad(11)).mkString(" "))
      } ++ (20L to 59L).map(id => (id, pad(12).mkString(" ")))
    rows.toDF("doc_id", "text")
  }

  // embeddings aligned with the planted relevance: rel-2 docs nearly
  // parallel to the query vector, rel-1 at ~0.6, rel-0 near-orthogonal
  private def relevanceEmb: DataFrame = {
    def unit(xs: Array[Double]): Seq[Double] = {
      val n = math.sqrt(xs.map(x => x * x).sum); xs.map(_ / n).toSeq
    }
    val rows =
      (0L to 9L).map { id =>
        (id, unit(Array(1.0, 0.05 + 0.01 * id, 0, 0, 0, 0, 0, 0)))
      } ++ (10L to 19L).map { id =>
        (id, unit(Array(0.6, 0.8, 0.001 * id, 0, 0, 0, 0, 0)))
      } ++ (20L to 59L).map { id =>
        (id, unit(Array(0.05, 0, 1.0, 0.01 * (id % 7), 0, 0, 0, 0)))
      } :+ ((100L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0)))
    rows.toDF("vec_id", "embedding")
  }

  test("bm25 + hybrid rrf quality gate: nDCG@10 floors on planted relevance") {
    val docs = relevanceDocs
    val rel = plantedRel
    val bmRanked = Bm25.search(docs, QTerms, k = 10).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    graft.core.Materialize.releaseAll(spark, blocking = true)
    val bmNdcg = ndcgAt(bmRanked, rel, 10)
    // metric sanity: the same metric on a worst-case ordering collapses
    val worst = rel.toSeq.sortBy(d => (d._2, d._1)).map(_._1)
    val worstNdcg = ndcgAt(worst, rel, 10)
    println(f"[quality] bm25 ndcg@10=$bmNdcg%.4f (worst-order control $worstNdcg%.4f)")
    assert(bmNdcg >= 0.90, f"BM25 nDCG@10 $bmNdcg%.4f below the 0.90 floor")
    assert(worstNdcg < 0.10, "metric control broken: worst ordering scored high")

    val hyRanked = Retrieval.hybridRrf(docs, relevanceEmb, QTerms,
        queryVecId = 100L, n = 20, k = 10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    graft.core.Materialize.releaseAll(spark, blocking = true)
    val hyNdcg = ndcgAt(hyRanked, rel, 10)
    println(f"[quality] hybrid_rrf ndcg@10=$hyNdcg%.4f")
    assert(hyNdcg >= 0.90, f"hybrid RRF nDCG@10 $hyNdcg%.4f below the 0.90 floor")
  }

  // ---------- MMR: diversity measured, not asserted ----------

  test("mmr quality gate: redundancy (mean pairwise cosine) drops hard vs " +
       "the plain relevance top-k on clustered candidates") {
    // four clusters of four EXACT duplicate candidates, all highly
    // relevant, pairwise-distinct across clusters: plain top-k drowns in
    // one cluster; MMR must spread across clusters
    def unit(xs: Array[Double]): Array[Double] = {
      val n = math.sqrt(xs.map(x => x * x).sum); xs.map(_ / n)
    }
    val protos = Array(
      unit(Array(0.951, 0.312, 0, 0, 0, 0, 0, 0)),
      unit(Array(0.950, 0, 0.312, 0, 0, 0, 0, 0)),
      unit(Array(0.949, 0, 0, 0.312, 0, 0, 0, 0)),
      unit(Array(0.948, 0, 0, 0, 0.312, 0, 0, 0)))
    val cand = for (c <- 0 until 4; i <- 0 until 4)
      yield ((c * 4 + i).toLong, protos(c).toSeq)
    val emb = (cand :+ ((200L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0))))
      .toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") === 200L)

    def cos(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map(t => t._1 * t._2).sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    def meanPairSim(ids: Seq[Long]): Double = {
      val m = cand.toMap
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(m(ids(i)), m(ids(j)))
      ps.sum / ps.size
    }

    val mmrIds = Retrieval.mmrRerank(spark, emb, queries, n = 16, k = 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    graft.core.Materialize.releaseAll(spark, blocking = true)
    // plain relevance top-4: rank candidates by cosine to the query
    // (ties to smaller id) — the un-diversified baseline MMR replaces
    val qv = Seq(1.0, 0, 0, 0, 0, 0, 0, 0)
    val plainIds = cand.sortBy { case (id, v) => (-cos(v, qv), id) }
      .take(4).map(_._1)

    val mmrSim = meanPairSim(mmrIds)
    val plainSim = meanPairSim(plainIds)
    println(f"[quality] mmr mean-pairwise-cos=$mmrSim%.4f vs plain top-k $plainSim%.4f")
    assert(plainSim >= 0.999,
      f"fixture broken: plain top-k should be one duplicate cluster ($plainSim%.4f)")
    assert(mmrSim <= 0.95,
      f"MMR selection still redundant: mean pairwise cos $mmrSim%.4f > 0.95")
    assert(mmrIds.map(_ / 4).distinct.size == 4,
      s"MMR must pick one candidate from each duplicate cluster, got $mmrIds")
  }
}
