package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.LongType

/** Byte-pair-encoding tokenizer over a ranked merges list — the PUBLIC
  * merges-file format (one "left right" pair per line, best rank first,
  * optional `#`-comment/version header) that open tokenizer releases
  * ship, so real-tokenizer token counts need no network and no
  * proprietary artifact: drop a released merges file in and the packing /
  * mix decisions run in the tokenizer's own units instead of whitespace
  * estimates.
  *
  * Semantics (classic character BPE): a word splits into single
  * characters, then the present pair with the LOWEST merge rank is merged
  * repeatedly — leftmost occurrence on equal ranks — until no listed pair
  * remains. Characters never covered by the merges stay single-character
  * tokens (no unk). Pre-tokenization is the same whitespace split every
  * other text operator here uses, so BPE counts compose with them.
  *
  * Scale design: the ranks map rides to executors once per task via the
  * closure (vocab-sized, dim-scale by contract); encoding is pure per-row
  * CPU inside mapPartitions with a per-partition word→length memo — under
  * Zipfian word frequency the memo turns the per-doc cost into a hit on
  * the few thousand hot words, exactly like a real tokenizer's cache.
  */
final class Bpe(merges: Seq[(String, String)]) extends Serializable {

  // first occurrence of a duplicated pair wins (plain toMap would keep
  // the LAST index — the opposite of merge-priority order)
  private val rank: Map[(String, String), Int] =
    merges.zipWithIndex.reverseIterator.toMap

  /** BPE token sequence for one whitespace-free word. */
  def encodeWord(word: String): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.lengthCompare(2) < 0
    while (!done) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        if (syms.lengthCompare(2) < 0) done = true
      }
    }
    syms
  }

  /** BPE token count of a text (null → 0, like the whitespace path's
    * null convention). `memo` caches per-word lengths across calls.
    */
  def countTokens(text: String,
                  memo: scala.collection.mutable.Map[String, Int]): Long =
    if (text == null) 0L
    else {
      var n = 0L
      val it = text.split("\\s+").iterator.filter(_.nonEmpty)
      while (it.hasNext) {
        val w = it.next()
        // bound the memo like a real tokenizer cache: a high-entropy
        // partition (base64 blobs, random ids) would otherwise grow it
        // with every distinct word until the executor heap dies; clearing
        // costs a re-encode of the hot set, never correctness
        if (memo.size >= Bpe.MemoCap) memo.clear()
        n += memo.getOrElseUpdate(w, encodeWord(w).length)
      }
      n
    }
}

object Bpe {

  /** Per-partition memo bound (entries). Zipfian text stays fully cached
    * far below this; high-entropy junk triggers cheap epoch clears.
    */
  private[graft] val MemoCap = 1 << 16

  /** Parse the public merges-file format: one "left right" pair per
    * line, rank = line order; blank lines and `#...` headers skipped.
    */
  def fromMergesLines(lines: Iterator[String]): Bpe =
    new Bpe(lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"malformed merges line: '$l'")
        (sp(0), sp(1))
      }.toSeq)

  /** Append a BPE token-count column to `docs` — the drop-in producer for
    * [[TextAnalysis.packPlanOn]] / [[TextAnalysis.packingStatsOn]] /
    * [[TextAnalysis.mixRebalanceOn]], so packing and mix decisions run in
    * real-tokenizer tokens. Pure mapPartitions (no shuffle, no join);
    * every input column passes through untouched.
    */
  def withTokens(docs: DataFrame, bpe: Bpe, textCol: String = "text",
                 outCol: String = "n_tokens"): DataFrame = {
    val schema = docs.schema.add(outCol, LongType, nullable = false)
    val idx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      it.map(r => Row.fromSeq(r.toSeq :+ bpe.countTokens(r.getString(idx), memo)))
    }(Encoders.row(schema))
  }
}
