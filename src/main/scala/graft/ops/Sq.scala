package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for the vector corpus — the third point on
  * the compression curve alongside the flat index (8 bytes/dim raw
  * doubles; 4 as float) and product quantization (ops/Ivf.scala's PQ,
  * sub-byte/dim but codebook-coupled): ONE byte per dimension, trained
  * from just 2·d corpus statistics, decoded with two flops — the format
  * FAISS calls SQ8 and serving stacks reach for when PQ's codebook
  * training/drift is not worth it.
  *
  * Codec: per-dimension min/max over the corpus (one exploded aggregation
  * keyed by dim index — d keys, trivially balanced at any corpus size;
  * the 2·d-double model is dim-scale like the IVF centroids).
  * step_i = (max_i − min_i)/255; code = clamp(⌊(x−min_i)/step_i + 0.5⌋,
  * 0, 255) (round-to-nearest); recon = min_i + code·step_i. Constant
  * dimensions (max == min) encode 0 / decode min. Every decode arithmetic
  * is plain IEEE +,−,×,÷,⌊⌋ over values both engines hold exactly, so the
  * oracle replays reconstruction bit-identically.
  *
  * Search is ASYMMETRIC (the ADC convention): raw query vs reconstructed
  * corpus, rounded cosine, bounded top-k heap — at scale the scan reads
  * d bytes/vector instead of 8d, an 8× working-set cut with recall far
  * above PQ at the same k (spec measures both). Encode/decode are
  * map-only; the only shuffle anywhere is the d-key min/max aggregation.
  */
object Sq {

  // null embeddings (malformed feed rows) drop at the parse boundary
  private def vecs(emb: DataFrame): DataFrame =
    emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-dim (min, max), index order. Dim-scale model: d rows collected. */
  def trainMinMax(emb: DataFrame): (Array[Double], Array[Double]) = {
    val rows = vecs(emb)
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i")).collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  private def reconColumn(v: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxs.toSeq)
    transform(v, (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      val step = (hi - lo) / lit(255.0)
      val code = least(greatest(floor((x - lo) / step + lit(0.5)), lit(0.0)), lit(255.0))
      when(hi === lo, lo).otherwise(lo + code * step)
    })
  }

  /** (vec_id, recon) — decoded vectors under the corpus-trained codec. */
  def sq8Recon(emb: DataFrame): DataFrame = {
    val (mins, maxs) = trainMinMax(emb)
    sq8ReconWith(emb, mins, maxs)
  }

  /** Decode under a PRE-TRAINED codec (the serving path). */
  def sq8ReconWith(emb: DataFrame, mins: Array[Double], maxs: Array[Double]): DataFrame =
    vecs(emb).select(col("vec_id"), reconColumn(col("v"), mins, maxs).as("recon"))

  /** (vec_id, codes) — the stored form, one small int (0–255) per dim. */
  def sq8Encode(emb: DataFrame, mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxs.toSeq)
    vecs(emb).select(col("vec_id"), transform(col("v"), (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      val step = (hi - lo) / lit(255.0)
      when(hi === lo, lit(0))
        .otherwise(least(greatest(floor((x - lo) / step + lit(0.5)), lit(0.0)),
          lit(255.0)).cast("int"))
    }).as("codes"))
  }

  /** Decode a codes frame (the serving read path; spec pins
    * encode→decode == [[sq8ReconWith]]).
    */
  def sq8Decode(codes: DataFrame, mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxs.toSeq)
    codes.select(col("vec_id"), transform(col("codes"), (c, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi === lo, lo)
        .otherwise(lo + c.cast("double") * ((hi - lo) / lit(255.0)))
    }).as("recon"))
  }

  /** Asymmetric brute-force top-k over the quantized corpus: raw queries,
    * reconstructed corpus, (qid, id2, cos, rn) like the other ann_* faces.
    * Self-contained form (trains the codec in place) for the oracle; pass
    * a pre-trained codec via the With variants to serve.
    */
  def searchTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val (mins, maxs) = trainMinMax(emb)
    val corpus = sq8ReconWith(emb, mins, maxs)
    val q = vecs(queries).select(col("vec_id").as("qid"), col("v").as("qv"))
    Similarity.topK(corpus.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(graft.functions.cosine_sim(col("qv"), col("recon")), 6).as("cos")), k)
  }
}
