package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over the embedding corpus — the projection/whitening pass a vector
  * pipeline runs before indexing (dimensionality cut for the ANN index,
  * decorrelated axes for PQ subspaces — OPQ's cheap cousin) or before
  * semantic dedup (distance computations in a denoised subspace).
  *
  * Scale design: the ONLY distributed work is one `treeAggregate` pass
  * accumulating (n, Σx, Σxxᵀ) — a d + d² accumulator per task (d=64 →
  * 33 KB), combined tree-wise; no shuffle of per-row data at all. The
  * d×d covariance eigendecomposition runs on the DRIVER via cyclic
  * Jacobi — the MLlib altitude: the model is dim-scale, never
  * data-scale (same argument as the IVF/PQ codebooks). Projection is
  * MAP-ONLY: centered dot products against the broadcast component
  * matrix through builtin higher-order functions (`zip_with` +
  * `aggregate` — codegen'd, no UDF).
  *
  * Determinism: Jacobi on the same covariance bits gives the same
  * eigenpairs; components sort by (eigenvalue desc, then first-element
  * sign convention — the largest-|entry| coordinate is made positive),
  * so two trainings on the same data agree bit-for-bit. Covariance is
  * the population form (divide by n), eigenvalues are the projected
  * variances under it.
  */
object Pca {

  /** Dim-scale PCA model: `mean` (d), `components` (k rows × d, unit
    * norm, mutually orthogonal, variance-descending), `eigenvalues` (k,
    * the projected population variances).
    */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
                   eigenvalues: Array[Double])

  // null embeddings (malformed feed rows) drop at the parse boundary
  private def vecs(emb: DataFrame): DataFrame =
    emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** ONE distributed accumulation pass → driver-side Jacobi → Model.
    * `k` caps the returned components (k ≤ d).
    */
  def train(emb: DataFrame, k: Int = 8): Model = {
    val rows = vecs(emb).select(col("v")).rdd
      .map(_.getSeq[Double](0).toArray)
    val d = rows.take(1).headOption.map(_.length).getOrElse(0)
    if (d == 0) return Model(Array.empty, Array.empty, Array.empty)
    // (count, Σx, Σxxᵀ upper-triangular packed) — d(d+1)/2 + d doubles
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, s, ss) = rows.treeAggregate(zero)(
      seqOp = { case ((c, sum, outer), x) =>
        var i = 0
        var t = 0
        while (i < d) {
          sum(i) += x(i)
          var j = i
          while (j < d) { outer(t) += x(i) * x(j); t += 1; j += 1 }
          i += 1
        }
        (c + 1, sum, outer)
      },
      combOp = { case ((c1, s1, o1), (c2, s2, o2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < o1.length) { o1(i) += o2(i); i += 1 }
        (c1 + c2, s1, o1)
      })
    if (n == 0) return Model(Array.empty, Array.empty, Array.empty)
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ss(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    // sort (eigenvalue desc, index asc), fix sign: largest-|entry|
    // coordinate positive (ties → lowest index) — bit-deterministic
    val order = evals.indices.sortBy(ix => (-evals(ix), ix)).take(k min d)
    val comps = order.map { ix =>
      val v = Array.tabulate(d)(r => evecs(r)(ix))
      val m = v.indices.maxBy(r => (math.abs(v(r)), -r))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(evals(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * classical algorithm): sweeps of (p,q) rotations zeroing a(p)(q)
    * until the off-diagonal mass is numerically gone. Returns
    * (eigenvalues, eigenvector COLUMNS aligned with them). O(d³) per
    * sweep — milliseconds at coarse-model d.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
                                 maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off: Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val tan =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(tan * tan + 1)
            val s = tan * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def arrLit(xs: Array[Double]): Column =
    array(xs.toIndexedSeq.map(lit(_)): _*)

  /** Map-only projection onto the model's components: emits
    * (vec_id, proj: array<double> of length k). `whiten = true` divides
    * each coordinate by √eigenvalue (unit-variance axes — the PQ/OPQ
    * preprocessing form); zero-variance axes stay unscaled rather than
    * dividing by zero. Pure builtin higher-order functions over the
    * broadcast literal matrix — no UDF, no shuffle.
    */
  def project(emb: DataFrame, model: Model, whiten: Boolean = false): DataFrame = {
    if (model.components.isEmpty)
      return vecs(emb).select(col("vec_id"),
        array().cast("array<double>").as("proj")).limit(0)
    val centered = zip_with(col("v"), arrLit(model.mean), (x, mu) => x - mu)
    val cols = model.components.zipWithIndex.map { case (comp, ix) =>
      val dot = aggregate(
        zip_with(centered, arrLit(comp), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      val ev = model.eigenvalues(ix)
      if (whiten && ev > 1e-12) dot / math.sqrt(ev) else dot
    }
    vecs(emb).select(col("vec_id"), array(cols.toIndexedSeq: _*).as("proj"))
  }
}
