package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, independent of the Column expression. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    val k = vals.size
    var z = 0L
    for (c <- vals.indices; j <- 0 until bits)
      z |= ((vals(c) >> j) & 1L) << (j * k + c)
    z
  }

  test("zorderKey matches the reference interleave bit for bit") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L),
      (85L, 170L), (128L, 1L), (37L, 201L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(Seq(x, y), 8), s"($x,$y)")
    }
    // the classic corner checks: interleave of all-ones is all-ones
    assert(got.find(t => t._1 == 255L && t._2 == 255L).get._3 == 65535L)
    assert(got.find(t => t._1 == 1L && t._2 == 0L).get._3 == 1L)
    assert(got.find(t => t._1 == 0L && t._2 == 1L).get._3 == 2L)
  }

  test("SQL zorder_key plans the same tree as the Column API") {
    // the injected SQL function (GraftExtensions) must agree with
    // Layout.zorderKey value for value — same interleave, same codegen
    val pts = Seq((3L, 5L), (200L, 17L), (0L, 255L)).toDF("x", "y")
    pts.createOrReplaceTempView("zpts")
    val viaSql = spark.sql("SELECT x, y, zorder_key(x, y, 8) AS z FROM zpts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaApi = pts.select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaSql == viaApi && viaSql.size == 3)
    // non-literal bits must be rejected, not silently misplanned
    intercept[Exception] {
      spark.sql("SELECT zorder_key(x, y, x) FROM zpts").collect()
    }
  }

  test("zorderKey generalizes to 3 columns") {
    val got = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .select(Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .head().getLong(0)
    assert(got == mortonRef(Seq(5L, 3L, 6L), 3))
  }

  test("aligned z prefixes are axis-aligned boxes (the skipping property)") {
    // every top-6-bit z bucket of an 8-bit x 8-bit interleave must hold
    // exactly one (x >> 5, y >> 5) cell — that is WHY per-file min/max
    // stats prune on both columns
    val pts = for (x <- 0L until 256L by 7L; y <- 0L until 256L by 5L) yield (x, y)
    val n = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .groupBy(shiftright(col("z"), 10).as("zb"))
      .agg(countDistinct(shiftright(col("x"), 5),
        shiftright(col("y"), 5)).as("cells"))
      .agg(max(col("cells")).as("m")).head().getLong(0)
    assert(n == 1L, s"a z bucket spanned $n grid cells")
  }

  test("normalize is exact integer division onto [0, 2^bits)") {
    val got = Seq(0L, 1L, 99L, 100L, 200L).toDF("x")
      .select(Layout.normalize(col("x"), lit(200L), 8).as("xn"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 126L, 127L, 254L))
    assert(got.forall(v => v >= 0 && v < 256))
  }

  test("zorderSkip's corpus scan reads only the two key columns") {
    // the normalized frame behind the skip comparison (the part the cut
    // hides from zorder_skip's exposed plan): column pruning must reach
    // the parquet scan, and the max-normalization scalars arrive via a
    // broadcast nested-loop of a 1-row frame — never a row-scale
    // cartesian or a shuffled join
    val li = graft.core.Tables.table(spark, Sf0001, "lineitem")
    val mx = li.agg(max(col("l_partkey")).cast("long").as("mx"),
      max(col("l_suppkey")).cast("long").as("my"))
    val base = li.crossJoin(broadcast(mx))
      .select(Layout.normalize(col("l_partkey"), col("mx"), 8).as("xn"),
        Layout.normalize(col("l_suppkey"), col("my"), 8).as("yn"))
    base.count()
    val p = base.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("withHilbert is a true Hilbert curve: bijective and grid-adjacent") {
    // the defining property (and the one z-order fails): consecutive d
    // values are Manhattan-adjacent cells, and d is a bijection onto
    // [0, 4^bits) — validates the unrolled bit-twiddle against the
    // mathematical contract rather than one reference implementation
    val bits = 4
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Layout.withHilbert(pts.toDF("x", "y"), col("x"), col("y"),
        bits, "d")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 256L).toSeq, "not a bijection")
    got.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbert quarter ranges are quadrants (the skipping property)") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val n = Layout.withHilbert(pts.toDF("x", "y"), col("x"), col("y"), 4, "d")
      .groupBy(shiftright(col("d"), 6).as("q"))
      .agg(countDistinct(shiftright(col("x"), 3), shiftright(col("y"), 3))
        .as("cells"))
      .agg(max(col("cells"))).head().getLong(0)
    assert(n == 1L, s"a quarter d range spanned $n quadrants")
  }

  test("curveSkip: no layout dominates, and the table shows how") {
    val li = graft.core.Tables.table(spark, Sf0001, "lineitem")
    val rows = Layout.curveSkip(li, "l_partkey", "l_suppkey")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // quadrant-aligned box: both curves isolate it to ONE 2-cell file;
    // linear needs every slab the box's x range touches
    assert(rows(("zorder", "center_box")) == 1L)
    assert(rows(("hilbert", "center_box")) == 1L)
    assert(rows(("linear_x", "center_box")) == 4L)
    // x band: the linear layout's home game
    assert(rows(("linear_x", "x_band")) <= 4L)
    assert(rows(("linear_x", "x_band")) < rows(("hilbert", "x_band")))
    // y band: linear cannot prune at all (every slab spans all of y);
    // both curves prune hard
    assert(rows(("linear_x", "y_band")) == 32L)
    assert(rows(("zorder", "y_band")) < 32L)
    assert(rows(("hilbert", "y_band")) < 32L)
  }

  test("clusterWrite: REAL parquet row-group pruning reads fewer rows than linear") {
    // not the simulated stats of zorderSkip — actual files, actual
    // footers: write the same lineitem slice twice (linear-sorted by
    // partkey vs z-clustered on the normalized pair), filter on the
    // OTHER column (raw l_suppkey — the reader needs no layout
    // knowledge), and compare how many rows the parquet scans actually
    // surface after min/max row-group pruning
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = graft.core.Tables.table(spark, Sf0001, "lineitem")
    val mx = li.agg(max(col("l_partkey")).cast("long").as("mx"),
      max(col("l_suppkey")).cast("long").as("my"))
    val base = li.crossJoin(broadcast(mx))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        Layout.normalize(col("l_partkey"), col("mx"), 8).as("xn"),
        Layout.normalize(col("l_suppkey"), col("my"), 8).as("yn"))
      // pin the input partitioning: repartitionByRange SAMPLES per input
      // partition, so file boundaries (and which row groups straddle the
      // probe value) must not depend on how the shared test session
      // happened to split the upstream scan — the full-suite run shifted
      // one boundary and put a 43-row group over the ≤half bar
      .repartition(4, col("l_orderkey"))
    base.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$dir/linear")
    Layout.clusterWrite(base, Seq("xn", "yn"), 8, s"$dir/zorder", 8)
    def scannedRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path).where(col("l_suppkey") === 1L)
      val kept = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head
      (scan.metrics("numOutputRows").value, kept)
    }
    val (linScanned, linKept) = scannedRows(s"$dir/linear")
    val (zScanned, zKept) = scannedRows(s"$dir/zorder")
    assert(linKept == zKept && linKept > 0, s"result drift: $linKept vs $zKept")
    // linear-by-partkey files all span the full suppkey domain: nothing
    // prunes; z-clustered row groups carry tight suppkey bounds
    assert(zScanned * 2 <= linScanned,
      s"z scan $zScanned not < half of linear $linScanned")
  }

  test("streaming z-order compaction: batches land skippable, replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("zstream").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val rows = ms.toDF.toDF("id", "xv", "yv")
      .select(col("id"), col("xv").bitwiseAND(lit(255L)).as("xn"),
        col("yv").bitwiseAND(lit(255L)).as("yn"))
    val q = graft.streaming.StreamingZorderCompact.run(
      rows, Seq("xn", "yn"), 8, root, nFiles = 4)
    val batch1 = (0L until 2000L).map(i => (i, i % 251L, (i * 7L) % 251L))
    val batch2 = (2000L until 4000L).map(i => (i, i % 251L, (i * 7L) % 251L))
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val all = spark.read.parquet(root)
    assert(all.count() == 4000L)
    // the layout is right from the first micro-batch: a filter on the
    // SECOND interleaved column prunes row groups inside each batch dir
    val df = all.where(col("yn") === 13L)
    val kept = df.collect().length.toLong
    val scanned = df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
    assert(kept > 0, "probe value missing from the stream")
    assert(scanned * 2 <= 4000L, s"scanned $scanned of 4000 — no pruning")
  }

  test("zorderSkip: the z layout reads fewer files AND fewer rows than linear") {
    val li = graft.core.Tables.table(spark, Sf0001, "lineitem")
    val rows = Layout.zorderSkip(li, "l_partkey", "l_suppkey")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (ltot, lread, lrows) = rows("linear_x")
    val (ztot, zread, zrows) = rows("zorder")
    assert(ltot == 64L && ztot <= 64L)
    // linear-by-x slabs span the full y domain: the centered box keeps
    // 1/8 of the x axis = 8 slabs; the z grid isolates the box to the
    // single 32x32 cell it covers
    assert(lread == 8L, s"linear read $lread")
    assert(zread < lread, s"z read $zread >= linear $lread")
    assert(zrows < lrows, s"z rows $zrows >= linear $lrows")
  }
}
