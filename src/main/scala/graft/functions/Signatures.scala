package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable md5-prefix hash: string → long from the first `hexChars` hex
  * characters of the md5 digest (hexChars ∈ {8, 15} → 32/60-bit values).
  * Numerically identical to `conv(substring(md5(x), 1, hexChars), 16, 10)`
  * — the form any SQL engine can replay — but computed straight from the
  * digest bytes: the first 8 hex chars are the first 4 bytes (top >>> 32
  * of the big-endian first 8 bytes), 15 hex chars drop the last nibble
  * (>>> 4). No hex string materialization, no radix-string parse.
  */
case class Md5PrefixLong(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars == 8 || hexChars == 15, "supported prefixes: 8 or 15 hex chars")

  override def dataType: DataType = LongType

  private def shift: Int = if (hexChars == 8) 32 else 4

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.valueOf(l >>> shift)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5Digest",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val d = ctx.freshName("digest"); val l = ctx.freshName("l")
      val i = ctx.freshName("i")
      s"""
         |byte[] $d = $md.digest($in.getBytes());
         |long $l = 0L;
         |for (int $i = 0; $i < 8; $i++) { $l = ($l << 8) | ($d[$i] & 0xffL); }
         |${ev.value} = $l >>> $shift;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native signature expressions for the dedup family. The composed-HOF
  * forms (`transform` × 128 permutations / 64 `aggregate`s) are correct but
  * interpreted per-lambda; these fuse the whole signature into one codegen
  * loop over the input hash array — O(n·k) tight Java, no per-element
  * closure dispatch.
  */

/** MinHash signature: array<long> shingle hashes → array<long> of
  * `a.length` permutation minima, h_i = min over s of (a_i*s + b_i) mod p.
  */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = a.length
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = java.lang.Math.floorMod(a(i) * hs.getLong(j) + b(i), p)
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val mn = ctx.freshName("mn"); val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |int $k = $aRef.length;
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $mn = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = java.lang.Math.floorMod(
         |      $aRef[$i] * $in.getLong($j) + $bRef[$i], ${p}L);
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $out[$i] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket: array<double> vector → int bucket id.
  * Bit i of the bucket is the sign of the dot product with plane i;
  * `planes` is the row-major (numPlanes × dim) matrix. One fused loop
  * instead of numPlanes aggregate/zip_with trees.
  */
case class LshBucket(child: Expression, planes: Array[Double], numPlanes: Int, dim: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = java.lang.Math.min(dim, v.numElements())
    var bucket = 0
    var i = 0
    while (i < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < d) { dot += planes(i * dim + j) * v.getDouble(j); j += 1 }
      if (dot > 0) bucket |= (1 << i)
      i += 1
    }
    java.lang.Integer.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $d = java.lang.Math.min($dim, $in.numElements());
         |int $bucket = 0;
         |for (int $i = 0; $i < $numPlanes; $i++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $dot += $pRef[$i * $dim + $j] * $in.getDouble($j);
         |  }
         |  if ($dot > 0) $bucket |= (1 << $i);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fully-fused shingle minhash: string → array<long> signature in ONE
  * pass — whitespace split, k-word shingles, md5-prefix hashes, and the
  * numPerm permutation minima, with one reused digest and no intermediate
  * Catalyst arrays. Returns NULL for documents shorter than k words (the
  * caller filters on isNotNull instead of re-splitting for a size guard).
  * Value-identical to the composed pipeline
  * (split → shinglesFromWords → hash32 → MinHashSignature); spec-asserted.
  */
case class ShingleMinHash(child: Expression, k: Int,
                          a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[UTF8String], k, a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("smhA", a, "long[]")
    val bRef = ctx.addReferenceObj("smhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = graft.functions.ShingleMinHash.compute($in, $k, $aRef, $bRef, ${p}L);
         |if ($res == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleMinHash {
  /** Static helper so generated code stays a one-line call (keeps the
    * projection inside whole-stage codegen). split(.., -1) keeps trailing
    * empty strings, matching Spark SQL's `split` semantics exactly.
    */
  def compute(text: UTF8String, k: Int, a: Array[Long], b: Array[Long],
              p: Long): GenericArrayData = {
    val words = text.toString.split("\\s+", -1)
    val nSh = words.length - (k - 1)
    if (words.length < 3 || nSh <= 0) return null // mirrors the size(ws) >= 3 gate
    val md = java.security.MessageDigest.getInstance("MD5")
    val nPerm = a.length
    val out = new Array[Long](nPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var l = 0L
      var bi = 0
      while (bi < 8) { l = (l << 8) | (d(bi) & 0xffL); bi += 1 }
      val h = l >>> 32 // first 8 hex chars == hash32
      var q = 0
      while (q < nPerm) {
        val v = java.lang.Math.floorMod(a(q) * h + b(q), p)
        if (v < out(q)) out(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Nearest-centroid cell id: array<double> vector → int cid maximizing the
  * cosine similarity against a broadcast row-major (k × dim) centroid
  * matrix; ties break to the lowest cid. One fused map-side loop — the
  * IVF assignment never materializes the n × k crossJoin.
  *
  * Cosines are rounded to 6 decimals (half away from zero, matching both
  * Spark's `round` and DuckDB's) before the argmax, so assignment is
  * bit-stable across engines even when two centroids nearly tie.
  */
case class NearestCell(child: Expression, centroids: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = java.lang.Math.min(dim, v.numElements())
    var nv = 0.0
    var j = 0
    while (j < d) { val x = v.getDouble(j); nv += x * x; j += 1 }
    var best = 0
    var bestC = java.lang.Double.NEGATIVE_INFINITY
    var cell = 0
    while (cell < k) {
      var dot = 0.0; var nc = 0.0
      j = 0
      while (j < d) {
        val c = centroids(cell * dim + j)
        dot += c * v.getDouble(j); nc += c * c
        j += 1
      }
      val cos = dot / (java.lang.Math.sqrt(nv) * java.lang.Math.sqrt(nc))
      var r = java.lang.Math.floor(java.lang.Math.abs(cos) * 1.0e6 + 0.5) / 1.0e6
      if (cos < 0) r = -r
      if (r > bestC) { bestC = r; best = cell }
      cell += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cellCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val nv = ctx.freshName("nv"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val cell = ctx.freshName("cell"); val dot = ctx.freshName("dot")
      val nc = ctx.freshName("nc"); val cv = ctx.freshName("cv")
      val cos = ctx.freshName("cos"); val r = ctx.freshName("r")
      s"""
         |int $d = java.lang.Math.min($dim, $in.numElements());
         |double $nv = 0.0;
         |for (int $j = 0; $j < $d; $j++) {
         |  double $x = $in.getDouble($j); $nv += $x * $x;
         |}
         |int $best = 0;
         |double $bestC = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $cell = 0; $cell < $k; $cell++) {
         |  double $dot = 0.0; double $nc = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    double $cv = $cRef[$cell * $dim + $j];
         |    $dot += $cv * $in.getDouble($j); $nc += $cv * $cv;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($nc));
         |  double $r = java.lang.Math.floor(java.lang.Math.abs($cos) * 1.0e6 + 0.5) / 1.0e6;
         |  if ($cos < 0) $r = -$r;
         |  if ($r > $bestC) { $bestC = $r; $best = $cell; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-level nearest-centroid refinement: (array<double> vector, int cid1)
  * → int GLOBAL sub-cell id maximizing cosine against the cid1-th block of
  * a row-major (k1·k2 × dim) sub-centroid matrix — the argmax runs ONLY
  * over rows [cid1·k2, (cid1+1)·k2), so per-row assignment cost is k2, not
  * k1·k2. Combined with the coarse [[NearestCell]] pass this makes total
  * assignment cost k1 + k2 per vector while the EFFECTIVE cell count is
  * k1·k2 — the "cells ∝ n at constant cell size" configuration the flat
  * quantizer can't reach (its per-row cost is the full cell count).
  *
  * Same determinism contract as [[NearestCell]]: cosines rounded to 6
  * decimals (half away from zero) before the argmax, ties to the lowest
  * sub-cell id. Out-of-range cid1 FAILS LOUDLY (IllegalArgumentException):
  * every in-repo caller supplies cid from assign() over the same model,
  * so a stray id can only mean a corrupt assignment or a model/assignment
  * pairing from different trainings — silently clamping it would make
  * downstream graphs quietly wrong instead of failing the job.
  */
case class NearestSubCell(left: Expression, right: Expression,
                          centroids: Array[Double], k1: Int, k2: Int, dim: Int)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.DoubleArrayIntInputs {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any, cidIn: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val cid1 = cidIn.asInstanceOf[Int]
    if (cid1 < 0 || cid1 >= k1)
      throw new IllegalArgumentException(
        s"NearestSubCell: cid1 $cid1 out of [0, $k1) — corrupt assignment " +
          "or model/assignment pairing from different trainings")
    val d = java.lang.Math.min(dim, v.numElements())
    var nv = 0.0
    var j = 0
    while (j < d) { val x = v.getDouble(j); nv += x * x; j += 1 }
    val base = cid1 * k2
    var best = base
    var bestC = java.lang.Double.NEGATIVE_INFINITY
    var cell = base
    while (cell < base + k2) {
      var dot = 0.0; var nc = 0.0
      j = 0
      while (j < d) {
        val c = centroids(cell * dim + j)
        dot += c * v.getDouble(j); nc += c * c
        j += 1
      }
      val cos = dot / (java.lang.Math.sqrt(nv) * java.lang.Math.sqrt(nc))
      var r = java.lang.Math.floor(java.lang.Math.abs(cos) * 1.0e6 + 0.5) / 1.0e6
      if (cos < 0) r = -r
      if (r > bestC) { bestC = r; best = cell }
      cell += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("subCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, (in, cidIn) => {
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val nv = ctx.freshName("nv"); val x = ctx.freshName("x")
      val base = ctx.freshName("base"); val c1 = ctx.freshName("c1")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val cell = ctx.freshName("cell"); val dot = ctx.freshName("dot")
      val nc = ctx.freshName("nc"); val cv = ctx.freshName("cv")
      val cos = ctx.freshName("cos"); val r = ctx.freshName("r")
      s"""
         |int $d = java.lang.Math.min($dim, $in.numElements());
         |double $nv = 0.0;
         |for (int $j = 0; $j < $d; $j++) {
         |  double $x = $in.getDouble($j); $nv += $x * $x;
         |}
         |int $c1 = $cidIn;
         |if ($c1 < 0 || $c1 >= $k1) {
         |  throw new IllegalArgumentException(
         |    "NearestSubCell: cid1 " + $c1 + " out of [0, $k1) — corrupt " +
         |    "assignment or model/assignment pairing from different trainings");
         |}
         |int $base = $c1 * $k2;
         |int $best = $base;
         |double $bestC = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $cell = $base; $cell < $base + $k2; $cell++) {
         |  double $dot = 0.0; double $nc = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    double $cv = $cRef[$cell * $dim + $j];
         |    $dot += $cv * $in.getDouble($j); $nc += $cv * $cv;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($nv) * java.lang.Math.sqrt($nc));
         |  double $r = java.lang.Math.floor(java.lang.Math.abs($cos) * 1.0e6 + 0.5) / 1.0e6;
         |  if ($cos < 0) $r = -$r;
         |  if ($r > $bestC) { $bestC = $r; $best = $cell; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash: array<long> token hashes → long. Bit j of the result is
  * set iff the majority of token hashes have bit j set.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      j += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val bit = ctx.freshName("bit"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $in.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $in.getLong($j);
         |  for (int $bit = 0; $bit < 64; $bit++) {
         |    if ((($h >>> $bit) & 1L) == 1L) $votes[$bit]++; else $votes[$bit]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $bit = 0; $bit < 64; $bit++) {
         |  if ($votes[$bit] > 0) $sig |= (1L << $bit);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
