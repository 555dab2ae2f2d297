package graft

import graft.ops.{Graph, LmScore, Similarity, Sq, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 additions: integer-scaled PageRank, the reference-LM
  * perplexity filter, SQ8 scalar quantization, and the vocab-coverage
  * curve. Each pinned on hand-built micro-graphs/corpora where the right
  * answer is computable by hand, plus determinism/scale-shape contracts
  * on the sf0.001 tables.
  */
class GraphLmSqSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  // ---- PageRank ----

  test("pageRank: star graph ranks the hub above the spokes") {
    import spark.implicits._
    // 4 spokes all pointing at node 0; 0 points back at 1
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 5)
    assert(pr(0L) > pr(1L), s"hub must outrank spokes: $pr")
    assert(pr(1L) > pr(2L), s"0's sole target outranks plain spokes: $pr")
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L), s"symmetric spokes tie: $pr")
    // mass sanity: totals stay below 1.0 (dangling drop convention) and
    // above the pure-teleport floor
    val total = pr.values.sum
    assert(total <= 1000000000L && total > 150000000L)
  }

  test("pageRank: integer ranks are invariant under repartitioning") {
    import spark.implicits._
    val edges = (0L until 40L).flatMap(i => Seq((i, (i + 1) % 40), (i, (i * 7 + 3) % 40)))
      .toDF("src", "dst")
    val a = Graph.pageRank(edges).orderBy(col("v")).collect().toSeq
    val b = Graph.pageRank(edges.repartition(13, col("dst"))).orderBy(col("v")).collect().toSeq
    assert(a == b, "integer PageRank must be partitioning-invariant")
  }

  // ---- label propagation ----

  test("labelPropagation: two triangles joined by a bridge stay separate") {
    import spark.implicits._
    val tri = (a: Long, b: Long, c: Long) => Seq((a, b), (b, c), (a, c))
    val edges = (tri(0L, 1L, 2L) ++ tri(10L, 11L, 12L) :+ ((2L, 10L)))
      .toDF("src", "dst")
    val r = Graph.labelPropagation(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 6)
    val a = Set(0L, 1L, 2L).map(r)
    val b = Set(10L, 11L, 12L).map(r)
    assert(a.size == 1, s"first triangle must agree: $r")
    assert(b.size == 1, s"second triangle must agree: $r")
    assert(a != b, s"bridge must not merge the communities: $r")
  }

  test("triangles: bridged-triangles counts and clustering coefficients") {
    import spark.implicits._
    val tri = (a: Long, b: Long, c: Long) => Seq((a, b), (b, c), (a, c))
    // two triangles joined by a bridge (2-10): the bridge closes nothing
    val edges = (tri(0L, 1L, 2L) ++ tri(10L, 11L, 12L) :+ ((2L, 10L)))
      .toDF("src", "dst")
    val r = Graph.triangles(edges).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Long]("degree"), x.getAs[Long]("triangles"),
          x.getAs[Double]("clust_coeff"))).toMap
    assert(r.size == 6)
    Seq(0L, 1L, 11L, 12L).foreach { v =>
      assert(r(v) == ((2L, 1L, 1.0)), s"$v: ${r(v)}")
    }
    // bridge endpoints: degree 3, still one triangle, 2*1/(3*2) = 1/3
    Seq(2L, 10L).foreach { v =>
      assert(r(v) == ((3L, 1L, 0.333333)), s"$v: ${r(v)}")
    }
  }

  test("triangles: direction/duplicate edges collapse; triangle-free is zero") {
    import spark.implicits._
    // a path graph given with BOTH directions and a repeated edge: the
    // canonical undirected set must dedup, and no triangle exists
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val r = Graph.triangles(edges).collect()
    assert(r.length == 4)
    assert(r.forall(_.getAs[Long]("triangles") == 0L), r.mkString(", "))
    val byId = r.map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("degree")).toMap
    assert(byId == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L), byId.toString)
  }

  test("assortativity: a star is exactly -1; a cycle null-guards (regular)") {
    import spark.implicits._
    // K_{1,4}: hubs only ever link leaves -> perfect disassortativity.
    // m=4, sx=20, sxx=68, sxy=32: (8*32-400)/(8*68-400) = -144/144 = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val r = Graph.assortativity(star).collect().head
    assert(r.getAs[Long]("m_edges") == 4L)
    assert(r.getAs[Double]("assortativity") == -1.0, r.toString)
    // 4-cycle: degree-regular -> zero variance -> null, never NaN
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val c = Graph.assortativity(cyc).collect().head
    assert(c.getAs[Long]("m_edges") == 4L)
    assert(c.isNullAt(c.fieldIndex("assortativity")), c.toString)
    // direction/duplicate edges collapse into the undirected view
    val dup = Seq((0L, 1L), (1L, 0L), (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("src", "dst")
    assert(Graph.assortativity(dup).collect().head
      .getAs[Double]("assortativity") == -1.0)
  }

  test("kCore: triangle survives k=2 peel, tail does not; k=3 empties") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.kCore(edges, k = 2).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Long]("core_deg")).toMap
    // peeling 4 (deg 1) exposes 3 (deg 1): only the triangle remains
    assert(r == Map(0L -> 2L, 1L -> 2L, 2L -> 2L), r.toString)
    assert(Graph.kCore(edges, k = 3).collect().isEmpty)
  }

  test("kCore: differential vs a brute-force peel on a pseudo-random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val raw = Seq.fill(80)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    def brute(k: Int): Map[Long, Int] = {
      var und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).toSet
      var changed = true
      while (changed) {
        val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, s) => (v, s.size) }
        val bad = deg.filter(_._2 < k).keySet
        val nu = und.filter(e => !bad(e._1) && !bad(e._2))
        changed = nu.size != und.size
        und = nu
      }
      und.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, s) => (v, s.size) }
    }
    val df = raw.toDF("src", "dst")
    for (k <- Seq(2, 3, 4)) {
      val got = Graph.kCore(df, k).collect()
        .map(x => x.getAs[Long]("node") -> x.getAs[Long]("core_deg").toInt).toMap
      assert(got == brute(k), s"k=$k: got $got expected ${brute(k)}")
    }
  }

  test("labelPropagation: deterministic under repartitioning; isolated-free") {
    import spark.implicits._
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i + 1) % 30), (i, (i * 11 + 5) % 30))).toDF("src", "dst")
    val x = Graph.labelPropagation(edges).orderBy("v").collect().toSeq
    val y = Graph.labelPropagation(edges.repartition(7, col("src")))
      .orderBy("v").collect().toSeq
    assert(x == y, "LPA must be partitioning-invariant")
  }

  // ---- LM perplexity ----

  test("lmPerplexity: in-reference docs score lower than OOV docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat sat on the mat", "en", "src0", 22L),
      (2L, "the cat sat on the mat", "en", "srcX", 22L), // same text, scored slice
      (3L, "zz qq ww vv xx yy zz qq", "en", "srcX", 23L) // fully OOV
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = LmScore.lmPerplexity(d, "src0").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size == 3)
    // identical-to-reference text scores identically to the train doc
    assert(r(1L).getDouble(3) == r(2L).getDouble(3))
    assert(r(2L).getLong(2) == 0L, "no OOV bigrams in reference text")
    // the OOV doc is strictly worse and fully OOV
    assert(r(3L).getDouble(3) > r(2L).getDouble(3))
    assert(r(3L).getLong(2) == r(3L).getLong(1), "every bigram OOV")
    // ppl == exp(log_ppl) after rounding
    assert(math.abs(r(2L).getDouble(4) - math.exp(r(2L).getDouble(3))) < 1e-5)
  }

  test("lmPerplexity: smoothing gives every doc a finite score (sf0.001)") {
    val r = LmScore.lmPerplexity(docs).cache()
    assert(r.count() > 0)
    assert(r.where(col("log_ppl").isNull || isnan(col("log_ppl"))).count() == 0L)
    // worst-case per-bigram nll is ln(c1_max + V) (an unseen bigram after
    // the most frequent history); bound with the coarser ln(B + V) where
    // B = total train bigrams >= any c1
    val ref = docs.where(col("source") === "src0")
    val vocabN = ref
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "").distinct().count() + 1
    val totalB = ref.select((size(split(col("text"), "\\s+")) - 1).as("nb"))
      .where(col("nb") > 0).agg(sum(col("nb"))).head().getLong(0)
    val maxNll = math.log((totalB + vocabN).toDouble)
    assert(r.agg(max(col("log_ppl"))).head().getDouble(0) <= maxNll + 1e-6)
    r.unpersist()
  }

  // ---- SQ8 ----

  test("sq8: codes are bytes, decode matches direct recon, error bounded") {
    val (mins, maxs) = Sq.trainMinMax(emb)
    val codes = Sq.sq8Encode(emb, mins, maxs)
    val bad = codes.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0L, "codes out of byte range")
    // encode -> decode == direct recon (the serving read path contract)
    val viaCodes = Sq.sq8Decode(codes, mins, maxs)
    val direct = Sq.sq8ReconWith(emb, mins, maxs)
    assert(viaCodes.exceptAll(direct).count() == 0L &&
      direct.exceptAll(viaCodes).count() == 0L)
    // per-dim reconstruction error <= step/2 + eps (round-to-nearest)
    val err = direct.join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), Seq("vec_id"))
      .select(posexplode(arrays_zip(col("recon"), col("v"))).as(Seq("i", "p")))
      .select(col("i"), abs(col("p.recon") - col("p.v")).as("e"))
      .groupBy(col("i")).agg(max(col("e")).as("maxe"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    err.foreach { case (i, e) =>
      val step = (maxs(i) - mins(i)) / 255.0
      assert(e <= step / 2 + 1e-12, s"dim $i error $e > half-step ${step / 2}")
    }
  }

  test("sq8: asymmetric search recall vs exact is high (sf0.001)") {
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(spark, emb, q, 5)
      .select(col("qid"), col("id2"))
    val sq = Sq.searchTopK(emb, q, 5).select(col("qid"), col("id2"))
    val hit = sq.intersect(exact).count().toDouble
    val recall = hit / exact.count()
    assert(recall >= 0.8, s"SQ8 recall $recall below floor 0.8")
  }

  // ---- vocab coverage ----

  test("vocabCoverage: monotone, exact on a hand corpus") {
    import spark.implicits._
    // freqs: aa x 5, bb x 3, cc x 1 -> total 9
    val d = Seq((1L, "aa aa aa bb bb", "en", "s0", 14L),
      (2L, "aa aa bb cc", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.vocabCoverage(d, Seq(1, 2, 3, 10))
      .orderBy(col("v")).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 10L))
    assert(r.map(_.getLong(2)).toSeq == Seq(5L, 8L, 9L, 9L), "covered tokens")
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 3L), "n_types caps at vocab")
    assert(r.forall(_.getLong(3) == 9L))
    assert(math.abs(r(0).getDouble(4) - 5.0 / 9) < 1e-6)
  }

  test("vocabCoverage: coverage is monotone in V on sf0.001") {
    val r = TextAnalysis.vocabCoverage(docs).orderBy(col("v")).collect()
    val cov = r.map(_.getDouble(4)).toSeq
    assert(cov == cov.sorted, s"coverage must be monotone: $cov")
    assert(cov.last <= 1.0 + 1e-9)
  }

  // ---- streaming LM scoring ----

  test("StreamingLmScore: stream equals batch scoreWith across batch splits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = LmScore.train(docs.where(col("source") === "src0"))
    val ref = LmScore.scoreWith(docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val buf = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
    val q = graft.streaming.StreamingLmScore.serve(
      stream.toDF.toDF("doc_id", "text"), model) { (df, _) =>
      buf ++= df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    try {
      val (a, b) = all.splitAt(all.length / 3)
      stream.addData(a.toSeq: _*)
      q.processAllAvailable()
      stream.addData(b.toSeq: _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      assert(buf.toSet == ref, "stream face diverged from batch scoreWith")
    } finally q.stop()
  }

  // ---- BM25 ----

  test("bm25: hand-computed score on a toy corpus, ranking order") {
    import spark.implicits._
    val d = Seq(
      (1L, "cat dog cat", "en", "s0", 11L), // tf(cat)=2 in a 3-token doc
      (2L, "cat fish", "en", "s0", 8L),
      (3L, "bird fish tree", "en", "s0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ops.Bm25.search(d, Seq("cat"), k = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // only docs containing "cat" rank
    assert(r.keySet == Set(1L, 2L))
    // hand BM25: N=3, df=2, idf=ln((3-2+0.5)/(2+0.5)+1); avgdl=8/3
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def sc(tf: Long, dl: Long) = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / (8.0 / 3)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(r(1L) - sc(2, 3)) < 1e-9, s"${r(1L)} != ${sc(2, 3)}")
    assert(math.abs(r(2L) - sc(1, 2)) < 1e-9)
    assert(r(1L) > r(2L), "higher tf must outrank at comparable length")
  }

  test("bm25: returns k docs and deterministic order on sf0.001") {
    val a = graft.ops.Bm25.search(docs, Seq("spark", "join", "data"), 20)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.size == 20)
    val b = graft.ops.Bm25.search(docs.repartition(17, col("doc_id")),
      Seq("spark", "join", "data"), 20)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(a == b, "BM25 ranking changed with partitioning")
  }

  // ---- range volatility ----

  test("rangeVolatility: hand-computed Parkinson/GK on a toy candle frame") {
    import spark.implicits._
    val candles = Seq(
      ("A", ts(T0), 100.0, 110.0, 90.0, 105.0, 10.0, 3L),
      ("A", ts(T0 + 3600), 105.0, 120.0, 100.0, 95.0, 10.0, 3L),
      // degenerate candle: h==l, c==o -> both terms 0
      ("B", ts(T0), 50.0, 50.0, 50.0, 50.0, 1.0, 1L))
      .toDF("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
    val r = graft.ohlcv.Analytics.rangeVolatility(candles).collect()
      .map(x => x.getString(0) -> x).toMap
    def rd6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val x1 = rd6(math.log(110.0 / 90.0)); val x2 = rd6(math.log(120.0 / 100.0))
    val sx2 = x1 * x1 + x2 * x2
    val expectedP = rd6(math.sqrt(sx2 / 2 / 2.772588722239781))
    assert(math.abs(r("A").getDouble(2) - expectedP) < 1e-9,
      s"parkinson ${r("A").getDouble(2)} != $expectedP")
    assert(r("A").getDouble(3) >= 0.0)
    assert(r("B").getDouble(2) == 0.0 && r("B").getDouble(3) == 0.0,
      "flat candle must contribute zero range volatility")
    assert(r("B").getLong(1) == 1L)
  }

  test("rangeVolatility: finite and nonnegative on sf0.001 1h candles") {
    val c = graft.ohlcv.Candles.fromTrades(
      graft.core.Tables.trades(spark, Sf0001), graft.core.Timeframe.parse("1h"))
    val r = graft.ohlcv.Analytics.rangeVolatility(c).cache()
    assert(r.count() > 0)
    assert(r.where(col("parkinson") < 0 || col("garman_klass") < 0 ||
      isnan(col("parkinson")) || isnan(col("garman_klass"))).count() == 0L)
    r.unpersist()
  }

  // ---- CCNet head/middle/tail buckets (wave 14) ----

  test("ccnetBuckets: tercile order statistics, per-lang independence") {
    import spark.implicits._
    // 6 scoreable docs in one lang with distinct ppl (varying OOV load),
    // plus a second lang whose buckets must not bleed
    val d = (Seq((0L, "the cat sat on the mat the cat sat", "en", "src0", 1L)) ++
      (1 to 6).map { i =>
        val oov = Seq.fill(i)("zz").mkString(" ")
        (i.toLong, s"the cat sat $oov", "en", "srcX", 1L)
      } ++ Seq((7L, "the cat sat", "fr", "srcX", 1L),
        (8L, "zz qq ww vv", "fr", "srcX", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = LmScore.ccnetBuckets(d, "src0").collect()
    val en = r.filter(_.getAs[String]("lang") == "en")
    // k1 = ceil(7/3) = 3, k2 = ceil(14/3) = 5 over the 7 en docs
    def pplsOf(b: String) =
      en.filter(_.getAs[String]("bucket") == b).map(_.getAs[Double]("ppl"))
    assert(pplsOf("head").length == 3 && pplsOf("middle").length == 2 &&
      pplsOf("tail").length == 2, en.mkString(","))
    assert(pplsOf("head").max <= pplsOf("middle").min)
    assert(pplsOf("middle").max <= pplsOf("tail").min)
    // fr gets its own cutoffs: with n = 2, k1 = 1, k2 = 2 -> head + middle
    val fr = r.filter(_.getAs[String]("lang") == "fr")
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("bucket")).toMap
    assert(fr == Map(7L -> "head", 8L -> "middle"), fr.toString)
  }

  test("ccnetBuckets: sf0.001 — every lang's head holds at least its third") {
    val r = LmScore.ccnetBuckets(docs).cache()
    val perLang = r.groupBy(col("lang")).pivot("bucket")
      .agg(count(lit(1))).na.fill(0L).collect()
    perLang.foreach { row =>
      val lang = row.getAs[String]("lang")
      def c(b: String) =
        if (row.schema.fieldNames.contains(b)) row.getAs[Long](b) else 0L
      val n = c("head") + c("middle") + c("tail")
      assert(c("head") >= (n + 2) / 3, s"$lang: ${row.toString}")
      assert(c("head") + c("middle") >= (2 * n + 2) / 3, s"$lang")
    }
    r.unpersist()
  }
}
