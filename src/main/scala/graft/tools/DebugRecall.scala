package graft.tools

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-decomposition diagnostic (kept as a maintained tool, not a
  * scratch main): splits ANN recall into routing loss (exact scoring in
  * probed cells) vs PQ loss (ADC scoring), flat vs two-level. Data dir
  * comes from SPARK_GRAFT_SF_DIR like the other mains, so the tool runs
  * against any corpus and does not rot onto a hardcoded path.
  */
object DebugRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 18).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.table(spark, dir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val q = emb.where(col("vec_id") < 10)
    val truth = graft.ops.Similarity.bruteForceTopK(spark, emb, q, 5)
      .select(col("qid"), col("id2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTruth = truth.count()
    def recallOf(got: DataFrame): Double = {
      val hits = got.select(col("qid"), col("id2"))
        .join(truth, Seq("qid", "id2"), "left_semi").count()
      hits.toDouble / nTruth
    }
    // (a) flat IVF, EXACT in-cell scoring (routing-only loss), 9 cells
    println("=== x1, 2000 vecs, 10 queries, truth = exact top-5 ===")
    for (cells <- Seq(9, 16)) {
      val r = recallOf(graft.ops.Ivf.searchTopK(emb, q, 5,
        numCells = cells, iters = 0, nprobe = 4))
      graft.core.Materialize.releaseAll(spark, blocking = true)
      println(f"flat EXACT  $cells%3d cells nprobe=4      : recall@5 $r%.3f")
    }
    // (b) flat IVF-PQ ADC (adds PQ loss)
    for (cells <- Seq(9, 16)) {
      val r = recallOf(graft.ops.Ivf.ivfPqSearch(emb, q, 5,
        numCells = cells, iters = 0, nprobe = 4))
      graft.core.Materialize.releaseAll(spark, blocking = true)
      println(f"flat ADC    $cells%3d cells nprobe=4 m=4  : recall@5 $r%.3f")
    }
    // (c) flat rerank
    for (cells <- Seq(9, 16)) {
      val r = recallOf(graft.ops.Ivf.ivfPqSearchRerank(emb, q, 5,
        numCells = cells, iters = 0, nprobe = 4))
      graft.core.Materialize.releaseAll(spark, blocking = true)
      println(f"flat RERANK $cells%3d cells nprobe=4 m=4  : recall@5 $r%.3f")
    }
    // (d) two-level 3x3, exact scoring within hierarchically-probed cells
    //     is not a public face; ADC + rerank measured in r14recall. Add
    //     m sweep on the flat ADC to see the codebook-resolution axis.
    for (m <- Seq(4, 8, 16)) {
      val r = recallOf(graft.ops.Ivf.ivfPqSearch(emb, q, 5,
        numCells = 16, iters = 0, nprobe = 4, m = m))
      graft.core.Materialize.releaseAll(spark, blocking = true)
      println(f"flat ADC     16 cells nprobe=4 m=$m%-2d  : recall@5 $r%.3f")
    }
    // score-scale diagnostics for qid 0: exact vs ADC
    println("=== qid 0 exact top-5 (scores) ===")
    graft.ops.Similarity.bruteForceTopK(spark, emb, emb.where(col("vec_id") === 0), 5)
      .show(5, false)
    println("=== qid 0 ADC top-5 m=16 (scores) ===")
    graft.ops.Ivf.ivfPqSearch(emb, emb.where(col("vec_id") === 0), 5,
      numCells = 16, iters = 0, nprobe = 4, m = 16).show(5, false)
    println("=== qid 0 recon quality: recon_cos distribution (m=16) ===")
    graft.ops.Ivf.ivfPqEncode(emb, numCells = 16, iters = 0, m = 16)
      .agg(min(col("recon_cos")), expr("percentile(recon_cos, 0.5)"),
        max(col("recon_cos"))).show(false)
    println("=== exact-cos distribution among 50 random pairs ===")
    val e2 = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e2.where(col("vec_id") < 10).as("a")
      .crossJoin(e2.where(col("vec_id").between(100, 104)).as("b"))
      .select(round(graft.functions.cosine_sim(col("a.v"), col("b.v")), 6).as("cos"))
      .agg(min(col("cos")), expr("percentile(cos, 0.5)"), max(col("cos"))).show(false)
    spark.stop()
  }
}
