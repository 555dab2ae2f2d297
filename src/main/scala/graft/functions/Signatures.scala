package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
