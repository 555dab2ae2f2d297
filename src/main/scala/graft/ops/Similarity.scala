package graft.ops

import graft.functions.{CosineSimilarity, ScoredId, TopKByScore}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * Scale design: the brute-force paths broadcast only the (small) query
  * set; candidate scoring is map-side over the big embedding table, and
  * top-k is a bounded-heap partial aggregate — each map task emits at most
  * k rows per query, so no full scored set ever shuffles. Exact pair
  * search is block-triangle partitioned (equi-joins only, no nested-loop
  * join). The 100 TB paths are `lshTopK` / `Ivf.searchTopK`: signatures
  * bucket the table map-only, and search touches a bounded candidate set.
  */
object Similarity {

  /** Register the native cosine expression for SQL + Column use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")

  /** Composed-built-ins cosine (reference semantics for the native expr). */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Native codegen'd cosine expression. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.cosine_sim(a, b)

  // null embeddings (malformed feed rows) drop at the parse boundary
  private def vecs(emb: DataFrame): DataFrame =
    emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Map-side bounded top-k per query over a scored candidate frame
    * (qid, id2, cos) → (qid, id2, cos, rn). See TopKByScore for why this
    * beats a row_number window at scale.
    */
  private[graft] def topK(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKByScore(k), ExpressionEncoder[ScoredId]())
    scored.groupBy(col("qid"))
      .agg(agg(col("cos"), col("id2")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("id2"), col("col.cos").as("cos"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** Per-dimension embedding profile — the sanity sweep before trusting a
    * vector corpus (dead dimensions, scale drift between snapshots,
    * out-of-range values). One posexplode (map-side) + one aggregation
    * keyed by dimension index (64-ish keys — trivially balanced at any
    * corpus size); means go through exact DECIMAL(30,15) partial sums
    * like the k-means trainer, so the profile is bit-stable across
    * engines and partitionings.
    */
  def embeddingProfile(emb: DataFrame): DataFrame =
    vecs(emb).select(col("vec_id"), posexplode(col("v")))
      .toDF("vec_id", "dim", "x")
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        // final decimal/count division rounded: the exact sums agree
        // across engines but the closing double division can differ 1 ulp
        round(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(30, 15)))
          .cast("double") / count(lit(1)), 6).as("mean_x"))

  /** recall@k of an approximate ANN result against the exact top-k truth
    * (both in the (qid, id2, …) shape the topK paths emit): the fraction
    * of true neighbor pairs the approximate search surfaced. One
    * equi-join + two counts — usable at evaluation scale to calibrate
    * nprobe / table-count knobs (see tools.ScaleProbe's recall mode).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select(col("qid"), col("id2"))
    val total = t.count()
    if (total == 0L) 1.0
    else t.join(approx.select(col("qid"), col("id2")), Seq("qid", "id2"))
      .count().toDouble / total
  }

  /** Exact near-duplicate pairs above a cosine threshold, block-triangle
    * partitioned: vectors hash into `blocks` blocks, the (bi ≤ bj) block
    * pair list is broadcast, and candidate generation is two equi-joins —
    * a plain shuffle join on the block key, never a BroadcastNestedLoopJoin.
    * The O(n²) comparison count is inherent to EXACT pair search; what the
    * blocking buys is that the work distributes across the cluster in
    * bounded per-task chunks (and AQE can split the heavier high-key
    * partitions). LSH/IVF are the sub-quadratic approximate paths.
    *
    * Thresholds and emitted values are rounded to 6 decimals so the
    * row-set is stable across engines/plans.
    */
  def nearDupPairs(spark: SparkSession, emb: DataFrame, threshold: Double,
                   blocks: Int = 32): DataFrame = {
    import spark.implicits._
    val e = vecs(emb).withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int"))
    val bp = (for (i <- 0 until blocks; j <- i until blocks) yield (i, j))
      .toDF("bi", "bj")
    val l = e.select(col("vec_id").as("vid1"), col("v").as("v1"), col("blk").as("bi"))
      .join(broadcast(bp), "bi")
    val r = e.select(col("vec_id").as("vid2"), col("v").as("v2"), col("blk").as("bj"))
    l.join(r, "bj")
      .where(col("bi") =!= col("bj") || col("vid1") < col("vid2"))
      .select(least(col("vid1"), col("vid2")).as("id1"),
        greatest(col("vid1"), col("vid2")).as("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** All-pairs reference form (BroadcastNestedLoopJoin by construction):
    * the small-sf truth source the blocked form is spec-checked against.
    */
  private[graft] def nearDupPairsAllPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val e = vecs(emb)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query vector (excluding self).
    * Deterministic: ordered by rounded cosine desc, then neighbor id.
    * Scoring is map-side (broadcast query set, native cosine codegen);
    * top-k is the bounded partial aggregate.
    */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    val e = vecs(emb)
    val q = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
    topK(e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(cosine(col("qv"), col("v")), 6).as("cos")), k)
  }

  /** Deterministic random hyperplanes (seeded); `table` varies the seed so
    * multi-table LSH gets independent plane sets (table 0 == the classic
    * single-table planes).
    */
  private[graft] def planes(numPlanes: Int, dim: Int, table: Int = 0): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7 + table)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id for a vector under the hyperplane set — one fused
    * native loop (graft.functions.LshBucket). `table` selects an
    * independent plane set for multi-table amplification.
    */
  def lshBucket(v: Column, numPlanes: Int = 12, dim: Int = 64, table: Int = 0): Column =
    graft.functions.lsh_bucket(v, planes(numPlanes, dim, table).flatten, numPlanes, dim)

  /** Composed-builtins bucket (reference semantics; spec asserts equality
    * with the native expression).
    */
  private[graft] def lshBucketComposed(v: Column, numPlanes: Int = 12, dim: Int = 64): Column =
    planes(numPlanes, dim).zipWithIndex.map { case (p, i) =>
      val proj = aggregate(zip_with(v, typedlit(p.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus all buckets at hamming distance 1 (multiprobe). Each candidate
    * vector lives in exactly one bucket, so probes never duplicate
    * candidates. Recall vs `bruteForceTopK` is measured in the spec; at
    * scale, recall is tuned by plane count, probe radius, and table count
    * while candidate volume stays ~(probes/2^planes) of the corpus.
    */
  def lshTopK(spark: SparkSession, emb: DataFrame, queries: DataFrame,
              k: Int, numPlanes: Int = 6): DataFrame = {
    val e = vecs(emb).withColumn("bucket", lshBucket(col("v"), numPlanes))
    val probes = (bucket: Column) =>
      array(bucket +: (0 until numPlanes).map(i =>
        bucket.bitwiseXOR(lit(1 << i))): _*)
    val q = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("bucket", explode(probes(lshBucket(col("qv"), numPlanes))))
    topK(e.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(cosine(col("qv"), col("v")), 6).as("cos")), k)
  }

  /** Multi-table LSH (OR-amplification): `numTables` independent
    * hyperplane tables; a vector is a candidate if ANY table puts it
    * within hamming≤1 of the query. Per-table hit probability p becomes
    * 1-(1-p)^T — the standard recall knob — while work stays bounded:
    * ONE pass computes all T bucket ids per vector (skinny
    * (vec_id, table, bucket) rows, no vector payload through the explode),
    * candidates are deduplicated across tables BEFORE the single scoring
    * join, and top-k is the bounded partial aggregate.
    */
  def lshTopKMulti(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                   k: Int, numPlanes: Int = 6, numTables: Int = 4): DataFrame = {
    val e = vecs(emb)
    val q0 = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
    val eb = e.select(col("vec_id"),
      posexplode(array((0 until numTables).map(t =>
        lshBucket(col("v"), numPlanes, table = t)): _*)))
      .toDF("vec_id", "table", "bucket")
    val probeStructs = (0 until numTables).flatMap { t =>
      val b = lshBucket(col("qv"), numPlanes, table = t)
      (0 to numPlanes).map { p =>
        val probe = if (p == 0) b else b.bitwiseXOR(lit(1 << (p - 1)))
        struct(lit(t).as("table"), probe.as("bucket"))
      }
    }
    val qt = q0.select(col("qid"), explode(array(probeStructs: _*)).as("pr"))
      .select(col("qid"), col("pr.table").as("table"), col("pr.bucket").as("bucket"))
    val cand = eb.join(broadcast(qt), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"))
      .distinct()
    topK(cand.join(e.select(col("vec_id").as("id2"), col("v")), "id2")
      .join(broadcast(q0), "qid")
      .select(col("qid"), col("id2"),
        round(cosine(col("qv"), col("v")), 6).as("cos")), k)
  }
}
