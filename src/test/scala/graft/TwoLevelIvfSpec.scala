package graft

import graft.ops.Ivf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-level (hierarchical) coarse quantizer: the "cells ∝ n at constant
  * cell size" configuration motivated by the ×243 ScaleProbe finding
  * (BENCH_NOTES r12) — flat assignment at n/c cells is quadratic in n,
  * two-level routing is k1 + k2 per row with k1·k2 effective cells.
  */
class TwoLevelIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  private def toyEmb(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def graphRows(df: DataFrame): Set[(Long, Long, Double, Long)] =
    df.select(col("vec_id").cast("long"), col("neighbor_id").cast("long"),
        col("cos"), col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("trainTwoLevel: k1=1, iters=0 degenerates to the flat seed matrix") {
    val m = Ivf.trainTwoLevel(emb, k1 = 1, k2 = 8, iters = 0)
    val flat = Ivf.train(emb, k = 8, iters = 0)
    assert(m.k1 == 1 && m.k2 == 8 && m.l2.length == 8)
    (m.l2 zip flat).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"sub-centroid $i differs from flat seed")
    }
  }

  test("knnGraphTwoLevel: k1=1 equals the flat knnGraph exactly (sf0.001)") {
    val two = graphRows(Ivf.knnGraphTwoLevel(emb, k1 = 1, k2 = 16, k = 5))
    val flat = graphRows(Ivf.knnGraph(emb, numCells = 16, k = 5))
    assert(two == flat, s"two-level(k1=1) != flat: ${two.size} vs ${flat.size} rows")
  }

  test("assignTwoLevel: scid always routes back to its own L1 cell") {
    val m = Ivf.trainTwoLevel(emb, k1 = 4, k2 = 4, iters = 1)
    assert(m.l2.length == m.k1 * m.k2)
    val e = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bad = Ivf.assignTwoLevel(e, m)
      .where(floor(col("scid") / m.k2) =!= col("cid")).count()
    assert(bad == 0L, s"$bad rows routed outside their L1 block")
  }

  test("knnComponentsTwoLevel: two tight clusters separate on a toy corpus") {
    // two orthogonal bundles, ids INTERLEAVED so the k1=2 lowest-vec_id
    // L1 seeds (ids 1, 2) come one from each bundle; k2=1 → scid == cid
    val e = toyEmb(Seq(
      1L -> Seq(1.00, 0.01), 3L -> Seq(0.99, 0.02), 5L -> Seq(0.98, 0.00),
      2L -> Seq(0.01, 1.00), 4L -> Seq(0.02, 0.99), 6L -> Seq(0.00, 0.98)))
    val comps = Ivf.knnComponentsTwoLevel(e, k1 = 2, k2 = 1, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(comps(1L), comps(3L), comps(5L)).size == 1)
    assert(Set(comps(2L), comps(4L), comps(6L)).size == 1)
    assert(comps(1L) != comps(2L), "orthogonal bundles merged")
  }

  test("knnComponentsTwoLevel: invariant under repartitioning (sf0.001)") {
    def run(parts: Int): Set[(Long, Long)] =
      Ivf.knnComponentsTwoLevel(emb.repartition(parts), k1 = 4, k2 = 4, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(13))
  }

  test("trainTwoLevel: under-full and empty blocks pad without crashing") {
    // 3 vectors, k1=2, k2=4: every block under-full; Lloyd round on top —
    // duplicates/padding must never break assignment or the graph
    val e = toyEmb(Seq(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1), 3L -> Seq(0.0, 1.0)))
    val m = Ivf.trainTwoLevel(e, k1 = 2, k2 = 4, iters = 1)
    assert(m.l2.length == m.k1 * 4)
    val assigned = Ivf.assignTwoLevel(
      e.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), m)
    assert(assigned.count() == 3L)
    // cells with ≤ k2 members seed one sub-cell per member, so the
    // within-sub-cell graph is EMPTY — the documented over-partitioning
    // degenerate (flat knnGraph at numCells ≥ n behaves identically);
    // the configuration contract is k1·k2 ≪ n / k
    val g = Ivf.knnGraphWithTwoLevel(e, m, k = 2)
    assert(g.count() == 0L)
  }

  test("two-level faces: empty corpus and null embeddings are results, not crashes") {
    val empty = toyEmb(Seq.empty)
    assert(Ivf.trainTwoLevel(empty, 2, 2).isEmpty)
    assert(Ivf.knnGraphTwoLevel(empty, 2, 2, 3).count() == 0L)
    assert(Ivf.knnComponentsTwoLevel(empty, 2, 2, 3).count() == 0L)
    // null embedding rows drop at the parse boundary (the vecs contract)
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, Seq(1.0, 0.0)),
        org.apache.spark.sql.Row(2L, Seq(0.9, 0.1)),
        org.apache.spark.sql.Row(3L, null))),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    val g = Ivf.knnGraphTwoLevel(withNull, k1 = 1, k2 = 1, k = 2)
    assert(graphRows(g).map(_._1) == Set(1L, 2L))
  }

  test("semantic faces: k1=1 equals the flat SemDeDup faces exactly") {
    // k1=1 → sub-seeds are the 16 lowest vec_ids = the flat seed matrix,
    // scid = local id = flat cid, keeper sub-centroid = flat centroid
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(Ivf.semanticNearDupTwoLevel(emb, k1 = 1, k2 = 16)) ==
      rows(Ivf.semanticNearDup(emb, numCells = 16)))
    assert(rows(Ivf.semanticDedupTwoLevel(emb, k1 = 1, k2 = 16)) ==
      rows(Ivf.semanticDedup(emb, numCells = 16)))
  }

  test("twoLevelSizing: cells ∝ n at (at most) the target cell size") {
    // the r13 ask-#5 policy: k1 = k2 = ceil(sqrt(n / c)) — enough cells
    // for the target size, per-row routing O(sqrt(n/c)) flops
    for (n <- Seq(0L, 1L, 255L, 256L, 257L, 100000L, 3645000L, 1000000000L);
         c <- Seq(64, 256, 1024)) {
      val (k1, k2) = Ivf.twoLevelSizing(n, c)
      assert(k1 == k2 && k1 >= 1, s"n=$n c=$c -> ($k1,$k2)")
      assert(k1.toLong * k2 * c >= n,
        s"under-provisioned: n=$n c=$c cells=${k1.toLong * k2}")
      // never grossly over-provisioned either: one ceil step of slack
      // on each level (k-1 on either axis would already be too few cells)
      if (n > c)
        assert((k1 - 1).toLong * (k2 - 1) * c < n,
          s"over-provisioned: n=$n c=$c k=$k1")
    }
    assert(Ivf.twoLevelSizing(0L) == (1, 1))
    assert(Ivf.twoLevelSizing(1L) == (1, 1))
    // monotone in n at fixed c
    val ks = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(n => Ivf.twoLevelSizing(n, 256)._1)
    assert(ks == ks.sorted, s"not monotone: $ks")
    intercept[IllegalArgumentException](Ivf.twoLevelSizing(10L, 0))
    intercept[IllegalArgumentException](Ivf.twoLevelSizing(-1L, 256))
  }

  test("twoLevelSizing: trainTwoLevel accepts the sized (k1, k2) end-to-end") {
    val (k1, k2) = Ivf.twoLevelSizing(500L, targetCell = 64)
    assert(k1 == 3 && k2 == 3) // ceil(sqrt(500/64)) = ceil(2.79...)
    val m = Ivf.trainTwoLevel(emb, k1, k2, iters = 0)
    assert(m.k1 == k1 && m.k2 == k2 && m.l2.length == k1 * k2)
    val cells = Ivf.assignTwoLevel(
      emb.where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      m)
    // expected cell size ≈ 500/9 ≈ 56 ≤ target; the QUANTIZER can't bound
    // the max cell (dup skew goes to one cell — that's what the dedup
    // cap is for), so pin the count, not the distribution
    assert(cells.select(col("scid")).distinct().count() <= (k1 * k2).toLong)
  }

  test("semantic 2level faces: empty corpus is a result, not a crash") {
    val empty = toyEmb(Seq.empty)
    assert(Ivf.semanticNearDupTwoLevel(empty, 2, 2).count() == 0L)
    assert(Ivf.semanticDedupTwoLevel(empty, 2, 2).count() == 0L)
  }

  test("two-level model round-trips through save/load; graph identical") {
    val m = Ivf.trainTwoLevel(emb, k1 = 4, k2 = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_tlm")
    try {
      val path = s"$dir/m"
      Ivf.saveTwoLevelModel(spark, m, path)
      val m2 = Ivf.loadTwoLevelModel(spark, path)
      assert(m2.k1 == m.k1 && m2.k2 == m.k2)
      assert((m.l1 zip m2.l1).forall { case (a, b) => a.sameElements(b) })
      assert((m.l2 zip m2.l2).forall { case (a, b) => a.sameElements(b) })
      assert(graphRows(Ivf.knnGraphWithTwoLevel(emb, m2, 5)) ==
        graphRows(Ivf.knnGraphWithTwoLevel(emb, m, 5)))
    } finally graft.tools.NullSweep.deleteRecursively(dir.toString)
  }

  test("ivfPq two-level faces: k1=1 equals the flat iters=0 faces exactly") {
    // with k1 = 1 the two-level model degenerates to the flat seed matrix
    // (pinned above), the hierarchical probe (1 block → nprobe sub-cells)
    // degenerates to the flat probe ranking over the same cells, and the
    // residuals/codebooks are identical — so both serving faces must
    // equal their flat iters=0 siblings ROW-FOR-ROW
    val q = emb.where(col("vec_id") < 10)
    def rows(df: DataFrame): Set[(Long, Long, Double, Long)] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val twoS = rows(Ivf.ivfPqSearchTwoLevel(emb, q, 5,
      k1 = 1, k2 = 16, nprobe1 = 1, nprobe = 4))
    val flatS = rows(Ivf.ivfPqSearch(emb, q, 5,
      numCells = 16, iters = 0, nprobe = 4))
    assert(twoS == flatS, "two-level ADC search (k1=1) != flat")
    val twoR = rows(Ivf.ivfPqSearchRerankTwoLevel(emb, q, 5,
      k1 = 1, k2 = 16, nprobe1 = 1, nprobe = 4))
    val flatR = rows(Ivf.ivfPqSearchRerank(emb, q, 5,
      numCells = 16, iters = 0, nprobe = 4))
    assert(twoR == flatR, "two-level rerank (k1=1) != flat")
  }

  test("filtered two-level IVF-PQ: k1=1 equals the flat filtered face") {
    val q = emb.where(col("vec_id") < 10)
    def rows(df: DataFrame): Set[(Long, Long, Double, Long)] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val tl = Ivf.trainTwoLevel(emb, k1 = 1, k2 = 16, iters = 0)
    val encTl = Ivf.ivfPqReconFrameTwoLevel(emb, tl, passthrough = Seq("label"))
    val two = rows(Ivf.ivfPqSearchFilteredWithTwoLevel(encTl, tl, q, 10,
      col("label") === 7, nprobe1 = 1, nprobe = 4))
    val cents = Ivf.train(emb, 16, iters = 0)
    val encFlat = Ivf.ivfPqReconFrame(emb, cents, passthrough = Seq("label"))
    val flat = rows(Ivf.ivfPqSearchFilteredWith(encFlat, cents, q, 10,
      col("label") === 7, nprobe = 4))
    assert(two == flat, "filtered two-level (k1=1) != flat filtered")
  }

  test("ivfPq two-level faces: empty corpus is a result, not a crash") {
    val empty = toyEmb(Seq.empty)
    assert(Ivf.ivfPqSearchTwoLevel(empty, empty, 5, k1 = 2, k2 = 2).count() == 0L)
    assert(Ivf.ivfPqEncodeTwoLevel(empty, k1 = 2, k2 = 2).count() == 0L)
  }

  test("residual PQ codebooks are non-degenerate at iters = 0") {
    // the r14 recall-table find: codebook seeds used to be the residuals
    // of the k LOWEST vec_ids — exactly the coarse quantizer's seed
    // members, whose residuals are identically ZERO at iters = 0 — so
    // Lloyd collapsed every book to ONE effective code and all ADC
    // scores in a cell tied (measured adc@5 = 0.04, invariant in m).
    // Seeds now come in portable md5-hash order; codes must actually
    // spread. Pre-fix this assertion reads countDistinct(code0) == 1.
    val enc = Ivf.ivfPqEncode(emb, numCells = 16, iters = 0)
    val distinctCodes = enc.select(countDistinct(col("code0"))).head().getLong(0)
    assert(distinctCodes >= 8,
      s"code0 uses only $distinctCodes of 16 codebook entries — degenerate book")
    val encTl = Ivf.ivfPqEncodeTwoLevel(emb, k1 = 4, k2 = 4)
    val distinctTl = encTl.select(countDistinct(col("code0"))).head().getLong(0)
    assert(distinctTl >= 8,
      s"two-level code0 uses only $distinctTl of 16 entries — degenerate book")
  }

  test("loadTwoLevelModel: a truncated model fails loudly, not silently") {
    // a level-2 row count that is not an exact multiple of k1 means the
    // scid = cid·k2 + local block arithmetic would route garbage — the
    // load must raise, never return a plausible-looking model
    val m = Ivf.trainTwoLevel(emb, k1 = 4, k2 = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_tlm_bad")
    try {
      val path = s"$dir/m"
      Ivf.saveTwoLevelModel(spark, m, path)
      val truncated = s"$dir/trunc"
      spark.read.parquet(path)
        .where(!(col("level") === 2 && col("cid") === 15))
        .write.parquet(truncated)
      val ex = intercept[IllegalArgumentException] {
        Ivf.loadTwoLevelModel(spark, truncated)
      }
      assert(ex.getMessage.contains("not a multiple of k1"))
      // 0 % k1 == 0, so entirely-missing level-2 rows slip the multiple
      // check (the r13 ADVICE finding): k2=0 would silently route every
      // row to scid 0 and the probe would divide by zero — must raise
      val noL2 = s"$dir/nol2"
      spark.read.parquet(path).where(col("level") === 1)
        .write.parquet(noL2)
      val ex2 = intercept[IllegalArgumentException] {
        Ivf.loadTwoLevelModel(spark, noL2)
      }
      assert(ex2.getMessage.contains("no level-2 rows"))
    } finally graft.tools.NullSweep.deleteRecursively(dir.toString)
  }

  test("NearestSubCell: an out-of-range cid1 fails the job loudly") {
    // the only in-repo caller supplies cid from assign() over the same
    // model, so a stray id can only mean a corrupt assignment or a
    // model/assignment pairing from different trainings — silently
    // clamping it would make downstream graphs quietly wrong
    val m = Ivf.trainTwoLevel(emb, k1 = 2, k2 = 2, iters = 0)
    val e = toyEmb(Seq(1L -> Seq.fill(64)(0.5)))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        lit(7).as("cid")) // out of [0, 2)
    val ex = intercept[Exception] { // SparkException or the raw IAE,
      // depending on whether the expression runs in a task or driver-side
      e.withColumn("scid", graft.functions.nearest_sub_cell(
          col("v"), col("cid"), m.l2.flatten, m.k1, m.k2, m.l1.head.length))
        .collect()
    }
    assert(ex.getMessage.contains("out of [0, 2)") ||
      Option(ex.getCause).exists(_.getMessage.contains("out of [0, 2)")))
  }

  test("two-level recovers nested cluster structure exactly as flat does") {
    // 6 tight bundles in 3 orthogonal super-groups (A/B/C on disjoint
    // axis pairs, ±0.4 sub-split within each): ground truth is 6
    // components of 10. ids interleave sub-bundles so the lowest-vec_id
    // seeding picks one L1 seed per super-group (ids 1..3) and one k2
    // seed per sub-bundle within each cell (ids 1&4, 2&5, 3&6). Both the
    // flat quantizer at 6 cells and the two-level 3×2 must recover the
    // exact ground-truth components — hierarchical routing costs nothing
    // when the data has the nested structure it models.
    val dirs = Seq( // sub_index 0..5 = A1 B1 C1 A2 B2 C2
      Seq(1.0, 0.4, 0.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.4, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.4), Seq(1.0, -0.4, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, -0.4, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 0.0, 1.0, -0.4))
    val rows = for (j <- 0 until 10; s <- 0 until 6) yield {
      val d = dirs(s).toArray.clone()
      val jitterAxis = dirs(s).indexWhere(x => x != 0.0 && math.abs(x) == 0.4)
      d(jitterAxis) = d(jitterAxis) + 0.01 * j // within-bundle cos ≈ 0.999
      (1L + s + 6L * j, d.toSeq)
    }
    val e = toyEmb(rows)
    def comps(df: DataFrame): Set[Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val truth = (0 until 6).map(s => (0 until 10).map(j => 1L + s + 6L * j).toSet).toSet
    val two = comps(Ivf.knnComponentsTwoLevel(e, k1 = 3, k2 = 2, k = 9))
    val flat = comps(Ivf.knnComponents(e, numCells = 6, k = 9))
    assert(two == truth, "two-level components differ from ground truth")
    assert(flat == truth, "flat components differ from ground truth")
  }
}
