package graft

import graft.ops.{Dq, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 additions: the one-pass declarative DQ constraint suite and
  * PMI collocations — hand-built frames with hand-computable answers,
  * plus the one-aggregation-job plan contract for Dq.
  */
class DqPmiSpec extends SparkSpec {

  // ---- Dq ----

  private def frame() = {
    import spark.implicits._
    Seq(
      (1L, 1, Some(10.0), "A"),
      (1L, 1, Some(20.0), "N"), // duplicate (k1,k2) pair
      (2L, 1, Some(60.0), "R"), // out of [0,50] range
      (3L, 1, None, "X") // null v, off-set flag
    ).toDF("k1", "k2", "v", "flag")
  }

  test("dq: per-constraint metrics and verdicts on a hand-built frame") {
    val r = Dq.check(frame(), Seq(
      Dq.minRows(1L),
      Dq.complete("v"),
      Dq.unique(Seq("k1", "k2")),
      Dq.inRange("v", 0.0, 50.0),
      Dq.inSet("flag", Seq("A", "N", "R"))))
      .collect().map(x => x.getString(0) -> ((x.getDouble(1), x.getBoolean(2)))).toMap
    assert(r("row_count") == ((4.0, true)))
    assert(r("complete_v") == ((0.75, false)))
    assert(r("unique_k1_k2") == ((0.75, false))) // 3 distinct pairs / 4 rows
    // range fraction is over NON-NULL values: 2 of 3 in [0,50]
    assert(r("range_v") == ((0.666667, false)))
    assert(r("set_flag") == ((0.75, false)))
  }

  test("dq: a fully clean frame passes every check") {
    import spark.implicits._
    val clean = Seq((1L, 1, 5.0, "A"), (2L, 1, 7.0, "N"))
      .toDF("k1", "k2", "v", "flag")
    val r = Dq.check(clean, Seq(
      Dq.minRows(2L), Dq.complete("v"), Dq.unique(Seq("k1", "k2")),
      Dq.inRange("v", 0.0, 50.0), Dq.inSet("flag", Seq("A", "N"))))
      .collect()
    assert(r.length == 5 && r.forall(_.getBoolean(2)), r.mkString("; "))
  }

  test("dq: N constraints plan as ONE aggregation over one scan") {
    // without `unique` (whose exact distinct needs its own Expand stage),
    // the whole suite must collapse to a single HashAggregate pair over a
    // single scan of the input — the one-pass claim, structurally
    val plan = Dq.check(frame(), Seq(
      Dq.minRows(1L), Dq.complete("v"),
      Dq.inRange("v", 0.0, 50.0), Dq.inSet("flag", Seq("A"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }

  // ---- bigram PMI ----

  test("bigramPmi: hand-computed PMI on a fixed corpus") {
    import spark.implicits._
    // 10 docs "a b", 5 docs "a c a c a c a c" -> bigram (a,b) perfectly
    // collocated for b; (a,c)/(c,a) dilute across many a/c occurrences
    val docs = ((1 to 10).map(i => (i.toLong, "a b")) ++
      (11 to 15).map(i => (i.toLong, "a c a c a c a c")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramPmi(docs, minCount = 5L)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // totals: nu = 10*2 + 5*8 = 60; nb = 10*1 + 5*7 = 45
    // counts: a: 10+20=30, b: 10, c: 20; (a,b)=10, (a,c)=20, (c,a)=15
    val ab = r(("a", "b"))
    assert(ab.getAs[Long]("n_ab") == 10L && ab.getAs[Long]("n_a") == 30L &&
      ab.getAs[Long]("n_b") == 10L)
    val expected = math.log((10.0 / 45.0) / ((30.0 / 60.0) * (10.0 / 60.0)))
    assert(math.abs(ab.getAs[Double]("pmi") - expected) < 1e-6)
    // the perfectly-collocated pair outranks the diluted reverse pair
    // ((c,a): 15/(20·30) < (a,b): 10/(30·10) in n_ab/(n_a·n_b) terms)
    assert(ab.getAs[Double]("pmi") > r(("c", "a")).getAs[Double]("pmi"))
  }

  test("bigramPmi: minCount floor removes hapax pairs; empty tokens ignored") {
    import spark.implicits._
    val docs = Seq((1L, "  x   y  "), (2L, "x y"), (3L, "rare pair"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramPmi(docs, minCount = 2L).collect()
    assert(r.length == 1)
    val row = r.head
    // whitespace runs produce no empty-token bigrams: (x,y) counted twice
    assert(row.getString(0) == "x" && row.getString(1) == "y" &&
      row.getAs[Long]("n_ab") == 2L)
  }

  // ---- PSI drift (wave 10) ----

  test("psi: identical distributions score exactly 0; a shift crosses 0.25") {
    import spark.implicits._
    val vals = (1 to 200).map(i => (i % 100).toDouble + 1.0)
    val same = (vals.map((_, true)) ++ vals.map((_, false))).toDF("v", "is_ref")
    val s = Dq.psiDrift(same, "v", col("is_ref")).collect().head
    assert(s.getAs[Double]("psi") == 0.0, s.toString)
    assert(s.getAs[Long]("n_ref") == 200L && s.getAs[Long]("n_cur") == 200L)
    // reference low-heavy, current high-heavy, overlapping mid support
    val ref = (1 to 180).map(i => ((i % 50).toDouble, true)) ++
      (1 to 20).map(i => (50.0 + (i % 50), true))
    val cur = (1 to 20).map(i => ((i % 50).toDouble, false)) ++
      (1 to 180).map(i => (50.0 + (i % 50), false))
    val d = Dq.psiDrift((ref ++ cur).toDF("v", "is_ref"), "v", col("is_ref"))
      .collect().head
    assert(d.getAs[Double]("psi") > 0.25, d.toString)
  }

  // ---- Benford first-digit screen (wave 8) ----

  test("benford: hand frame — digits from string form, zeros/negatives/nulls out") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(19.5), Some(0.02), Some(23.0), Some(999.0),
      Some(-5.0), Some(0.0), None).toDF("v")
    val rows = graft.ops.Dq.benford(df, "v").orderBy("digit").collect()
    assert(rows.length == 9, "all nine digits emit, observed or not")
    val byD = rows.map(r => r.getAs[Int]("digit") ->
      (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    // kept values: 1.0, 19.5 -> 1; 0.02, 23.0 -> 2; 999.0 -> 9 (n = 5)
    assert(byD(1) == ((2L, 0.4)) && byD(2) == ((2L, 0.4)) && byD(9) == ((1L, 0.2)),
      byD.toString)
    Seq(3, 4, 5, 6, 7, 8).foreach(d => assert(byD(d) == ((0L, 0.0)), byD.toString))
    val d1 = rows.head
    assert(d1.getAs[Double]("expected") == 0.30103)
    assert(math.abs(d1.getAs[Double]("dev") - (0.4 - 0.30103)) < 1e-9)
  }

  test("benford: magnitude-spanning data tracks the law, uniform data breaks it") {
    import spark.implicits._
    // log-uniform sample: exp over several decades follows Benford closely
    val logu = (1 to 4000).map(i => math.pow(10.0, i * 0.001 * 4)).toDF("v")
    val lr = graft.ops.Dq.benford(logu, "v").collect()
    assert(lr.map(r => math.abs(r.getAs[Double]("dev"))).max < 0.01,
      "log-uniform data must track Benford")
    // uniform [100, 200): digit 1 takes every row -> dev(1) huge
    val uni = (0 until 1000).map(i => 100.0 + (i % 100)).toDF("v")
    val ur = graft.ops.Dq.benford(uni, "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Double]("share")).toMap
    assert(ur(1) == 1.0, ur.toString)
  }
}
