package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for native expressions (Spark 4 classic). */
package object functions {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  def toExpression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** Native minhash signature column (see MinHashSignature). */
  def minhash_sig(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    toColumn(MinHashSignature(toExpression(hashes), a, b, p))

  /** Native 64-bit simhash column (see SimHash64). */
  def simhash64(hashes: Column): Column =
    toColumn(SimHash64(toExpression(hashes)))

  /** Native hyperplane-LSH bucket column (see LshBucket). */
  def lsh_bucket(v: Column, planes: Array[Double], numPlanes: Int, dim: Int): Column =
    toColumn(LshBucket(toExpression(v), planes, numPlanes, dim))

  /** Native cosine similarity column (see CosineSimilarity). */
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpression(a), toExpression(b)))

  /** Fully-fused shingle-minhash column (see ShingleMinHash). */
  def shingle_minhash(text: Column, k: Int, a: Array[Long], b: Array[Long],
                      p: Long): Column =
    toColumn(ShingleMinHash(toExpression(text), k, a, b, p))

  /** Native md5-prefix hash column (see Md5PrefixLong). */
  def md5_prefix_long(s: Column, hexChars: Int): Column =
    toColumn(Md5PrefixLong(toExpression(s), hexChars))

  /** Native nearest-centroid cell column (see NearestCell). */
  def nearest_cell(v: Column, centroids: Array[Double], k: Int, dim: Int): Column =
    toColumn(NearestCell(toExpression(v), centroids, k, dim))

  /** Native two-level sub-cell refinement column (see NearestSubCell). */
  def nearest_sub_cell(v: Column, cid1: Column, centroids: Array[Double],
                       k1: Int, k2: Int, dim: Int): Column =
    toColumn(NearestSubCell(toExpression(v), toExpression(cid1),
      centroids, k1, k2, dim))
}
