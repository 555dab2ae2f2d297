package graft.ops

import graft.functions.CosineSimilarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * Scale design: the brute-force paths broadcast only the (small) query
  * set; candidate scoring is map-side over the big embedding table, and
  * top-k is a bounded window per query. The 100 TB path is `lshTopK`:
  * random-hyperplane signatures bucket the table (map-only), and search
  * touches a single bucket — shuffle bounded by bucket sizes.
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

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact near-duplicate pairs above a cosine threshold. Thresholds and
    * emitted values are rounded to 6 decimals so the row-set is stable
    * across engines/plans. (All-pairs baseline; LSH is the scale path.)
    */
  def nearDupPairs(spark: SparkSession, emb: DataFrame, threshold: Double): DataFrame = {
    val e = vecs(emb)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query vector (excluding self).
    * Deterministic: ordered by rounded cosine desc, then neighbor id.
    */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    val e = vecs(emb)
    val q = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id2"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Deterministic random hyperplanes (seeded). */
  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id for a vector under the hyperplane set — one fused
    * native loop (graft.functions.LshBucket).
    */
  def lshBucket(v: Column, numPlanes: Int = 12, dim: Int = 64): Column =
    graft.functions.lsh_bucket(v, planes(numPlanes, dim).flatten, numPlanes, dim)

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
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id2"))
    e.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }
}
