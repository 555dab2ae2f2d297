package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * corpus into cells; search scans only the query's `nprobe` nearest
  * cells. Complements the hyperplane-LSH path (ops.Similarity.lshTopK).
  *
  * Scale design: training is `iters` rounds of (broadcast centroids →
  * map-side assign → groupBy(cell, dim) average) — the corpus is never
  * collected; assignment is one broadcast join; search shuffles only the
  * probed cells' candidates. Deterministic: centroid init takes the k
  * lowest vec_ids, ties in assignment break on cell id.
  */
object Ivf {

  private def vecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Assign each vector to its nearest centroid (max cosine, cid tiebreak). */
  def assign(spark: SparkSession, e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c").desc, col("cid"))
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cid"),
        graft.functions.cosine_sim(col("v"), col("cvec")).as("c"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** Materialize the (tiny, k-row) centroid table driver-side and rebuild
    * it as a fresh local DataFrame. Without this every Lloyd iteration —
    * and the final search — drags the previous iteration's full lineage
    * (crossJoin+window+explode+2×groupBy) into one enormous plan; a
    * k-means *model* belongs on the driver, exactly like MLlib's.
    */
  private def localize(spark: SparkSession, centroids: DataFrame): DataFrame = {
    import spark.implicits._
    centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .toSeq.toDF("cid", "cvec")
  }

  /** Train the coarse quantizer: (cid, cvec) centroid table (localized). */
  def train(emb: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val e = vecs(emb)
    var centroids = localize(spark, e.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cid"),
        col("v").as("cvec")))
    (1 to iters).foreach { _ =>
      centroids = localize(spark, assign(spark, e, centroids)
        .select(col("cid"), posexplode(col("v")))
        .toDF("cid", "pos", "x")
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("x"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
          s => s.getField("x")).as("cvec")))
    }
    centroids
  }

  /** Approximate top-k: scan only each query's `nprobe` nearest cells. */
  def searchTopK(emb: DataFrame, queries: DataFrame, k: Int,
                 numCells: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val centroids = train(emb, numCells, iters)
    val cells = assign(spark, vecs(emb), centroids) // vec_id, v, cid

    val wq = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("cid"))
    val probes = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("qv"), col("cid"),
        graft.functions.cosine_sim(col("qv"), col("cvec")).as("c"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id2"))
    cells.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(graft.functions.cosine_sim(col("qv"), col("v")), 6).as("cos"))
      .groupBy(col("qid"), col("id2")).agg(max(col("cos")).as("cos")) // cells may overlap probes
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }
}
