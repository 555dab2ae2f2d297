package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training over hashed bag-of-words
  * features — the fasttext-shaped quality/domain classifier a curation
  * pipeline trains IN the engine (label a seed set, fit, score the
  * crawl; the DataComp/CCNet filtering recipe) instead of exporting the
  * corpus to a separate trainer. Features are BINARY unigram presence
  * over md5-hashed buckets (`hash32 % d`, the dsir_weights convention)
  * — the strong sparse-text baseline, and the scale each full-batch
  * epoch actually moves under.
  *
  * Scale + determinism design:
  *  - The feature table — (doc_id, y, sorted distinct buckets) — is
  *    built once (one token explode, two map-side combined
  *    aggregations), materialized, and re-scanned per epoch; the
  *    vocabulary never ships anywhere, the model is d+1 doubles.
  *  - Each full-batch GD epoch is ONE `treeAggregate` pass: no shuffle,
  *    executors fold per-document gradient contributions into a
  *    (d+1)-length Long array, tree-combined to the driver's k-scale
  *    vector. Per-document contributions are QUANTIZED to scale-6
  *    integers (the integer-scaled PageRank idiom), so the
  *    cross-partition sum is exact Long arithmetic — order-free, hence
  *    **bit-reproducible on any partitioning / cluster size**, the
  *    property float gradient reduction famously lacks. Overflow needs
  *    one bucket to absorb >9·10¹² document-gradient units — more
  *    documents than a 100 TB corpus holds.
  *  - Per-document math (dot product in bucket-sorted order, sigmoid,
  *    quantization) sees only the broadcast weight vector — identical
  *    doubles everywhere — so every executor computes identical
  *    contributions for identical documents.
  *
  * Training-loop state on the driver is the (d+1)-vector and the loss
  * curve — nothing corpus-scale. [[score]] is the serving face: a pure
  * column expression (no UDF, no join, no shuffle — the weight vector
  * rides along as ONE array literal), codegen-friendly and usable on a
  * stream unchanged.
  */
object LogReg {

  /** Trained model: `weights(b)` for buckets 0..d-1, plus bias.
    * `lossCurve(e)` is the mean cross-entropy over epoch e's pass
    * (quantized micro-units averaged — deterministic like everything
    * else, so the curve is part of the reproducibility contract).
    */
  final case class Model(d: Int, weights: Array[Double], bias: Double,
                         lossCurve: Seq[Double]) {
    require(weights.length == d, "weights.length must equal d")
  }

  /** Hash bucket of a token column: first 8 md5 hex chars as int, mod d
    * (the dsir_weights recipe — engine-portable, replayable anywhere).
    */
  def hashBucket(token: Column, d: Int): Column =
    conv(substring(md5(token.cast("binary")), 1, 8), 16, 10)
      .cast("long") % d

  /** JVM-side twin of [[hashBucket]] for the per-partition training fold
    * — same digest, same prefix, same modulus. */
  private[graft] def hashBucketLocal(token: String, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % d).toInt
  }

  /** Per-document feature table: (doc_id, y, bs) with bs the SORTED
    * array of distinct present buckets — sorted so the training dot
    * product folds in one fixed order regardless of how collect_set
    * assembled it (aggregation order is the one nondeterminism in the
    * plan). Documents with zero tokens carry no row (no features ⇒
    * nothing to learn from; the lm_perplexity absent-row convention).
    */
  def features(docs: DataFrame, label: Column, d: Int): DataFrame =
    docs.select(col("doc_id"), label.cast("boolean").as("y"),
      explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .withColumn("b", hashBucket(col("w"), d).cast("int"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sort_array(collect_set(col("b"))).as("bs"))

  /** Full-batch fit: curvature-normalized gradient descent with
    * heavy-ball momentum. One treeAggregate pass per epoch over the
    * once-materialized feature table; see the object doc for the
    * determinism contract.
    *
    * The raw step is `lr / (0.25 · max_k)` where max_k is the largest
    * per-document distinct-bucket count, measured EXACTLY in the same
    * aggregation pass (a max-combined slot — associative and
    * order-free like the sums): 0.25·max_k bounds the logistic
    * Hessian's largest eigenvalue for presence features, so lr ≤ 1 is
    * provably inside the stable region for ANY corpus — no tuning per
    * dataset, no divergence on long documents (a damped diagonal
    * Newton was tried and REJECTED here: per-coordinate curvature
    * ignores the coupling between co-occurring tokens and limit-cycles
    * on real text). Momentum (β = 0.9) multiplies the effective step
    * ~10× on persistent gradient directions, which is what full-batch
    * GD needs to move a witness token's weight several units in tens
    * of epochs. Velocity lives on the driver — deterministic doubles
    * like the weights. L2 applies to weights, not the bias.
    */
  def train(docs: DataFrame, label: Column, d: Int = 1024,
            epochs: Int = 20, lr: Double = 1.0, l2: Double = 1e-6,
            momentum: Double = 0.9): Model = {
    require(d >= 1 && epochs >= 1, "d >= 1, epochs >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = graft.core.Materialize.once(features(docs, label, d))
      .as[(Long, Boolean, Seq[Int])]
    val w = new Array[Double](d + 1) // bias at index d
    val v = new Array[Double](d + 1)
    val curve = Seq.newBuilder[Double]
    val sc = spark.sparkContext
    var e = 0
    while (e < epochs) {
      val bw = sc.broadcast(w.clone())
      // quantized gradient in [0, d]; loss micro-units at d+1; doc count
      // at d+2; max distinct-bucket count at d+3 (max-combined)
      val zero = new Array[Long](d + 4)
      val agg = feats.rdd.treeAggregate(zero)(
        seqOp = (acc, doc) => {
          val (_, y, bs) = doc
          val wv = bw.value
          var z = wv(d)
          bs.foreach(b => z += wv(b))
          val p = 1.0 / (1.0 + math.exp(-z))
          val g = p - (if (y) 1.0 else 0.0)
          val gq = math.round(g * 1e6)
          bs.foreach(b => acc(b) += gq)
          acc(d) += gq
          val eps = 1e-12
          val loss =
            if (y) -math.log(math.max(p, eps))
            else -math.log(math.max(1.0 - p, eps))
          acc(d + 1) += math.round(loss * 1e6)
          acc(d + 2) += 1L
          acc(d + 3) = math.max(acc(d + 3), bs.length.toLong)
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < d + 3) { a(i) += b(i); i += 1 }
          a(d + 3) = math.max(a(d + 3), b(d + 3))
          a
        })
      bw.destroy()
      val n = math.max(agg(d + 2), 1L).toDouble
      val step = lr / (0.25 * math.max(agg(d + 3), 1L))
      var b = 0
      while (b < d) {
        v(b) = momentum * v(b) + (agg(b) / 1e6 / n + l2 * w(b))
        w(b) -= step * v(b)
        b += 1
      }
      v(d) = momentum * v(d) + agg(d) / 1e6 / n
      w(d) -= step * v(d)
      curve += agg(d + 1) / 1e6 / n
      e += 1
    }
    Model(d, w.take(d), w(d), curve.result())
  }

  /** Serving face: (doc_id, score, pred) with score = σ(bias +
    * Σ_{distinct buckets} weight(bucket)). PURE column expression — the
    * weight vector is one array literal, the per-token hash+lookup runs
    * inside `transform`/`aggregate` higher-order functions over the
    * DISTINCT bucket set (mirroring training's presence features), so
    * scoring is map-only whole-stage work with no UDF, join, or
    * shuffle; point it at a stream and it serves unchanged. Zero-token
    * documents score at σ(bias).
    */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val wlit = typedlit(model.weights.toSeq)
    val toks = filter(split(col("text"), "\\s+"), t => t =!= lit(""))
    val buckets = array_distinct(transform(toks,
      t => hashBucket(t, model.d).cast("int")))
    val z = lit(model.bias) +
      aggregate(buckets, lit(0.0), (acc, b) =>
        acc + element_at(wlit, b + lit(1)))
    docs.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .select(col("doc_id"), col("score"),
        (col("score") >= 0.5).as("pred"))
  }

  /** Oracled serving face: [[score]]'s exact plan shape under
    * DETERMINISTIC hash-derived pseudo-weights, engine-portable so a
    * SQL oracle can replay it — weight micro-units for bucket b are
    * `(b · 2654435761) mod 2000001 − 1000000` (Knuth's multiplicative
    * constant; a fixed pseudo-random value in [−1, 1] at scale 6).
    * z accumulates as an EXACT integer micro-unit sum over the
    * document's distinct buckets (order-free — the float-sum-order
    * trap the trained [[score]] face tolerates is eliminated here so
    * the cross-engine hash can match), and only the final sigmoid
    * touches floats: one shared-libm exp on an identical double, then
    * the round-12 emission (the dsir/zipf convention). Emits
    * (doc_id, n_buckets, score, pred); zero-token docs are absent
    * (the features contract).
    */
  def pseudoScore(docs: DataFrame, d: Int = 1024): DataFrame =
    docs.select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), hashBucket(col("w"), d).as("b"))
      .distinct()
      .withColumn("micro",
        (col("b") * lit(2654435761L)) % lit(2000001L) - lit(1000000L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("micro")).as("zmicro"))
      .select(col("doc_id"), col("n_buckets"),
        round(lit(1.0) / (lit(1.0) +
          exp(-col("zmicro").cast("double") / lit(1e6))), 12).as("score"),
        (col("zmicro") >= 0L).as("pred"))
}
