package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.LongType

/** Byte-pair-encoding tokenizer over a ranked merges list — the PUBLIC
  * merges-file format (one "left right" pair per line, best rank first,
  * optional `#`-comment/version header) that open tokenizer releases
  * ship, so tokenizer-unit token counts need no network and no
  * proprietary artifact.
  *
  * Two pre-tokenization modes:
  *
  *  - `byteLevel = false` (default): classic CHARACTER BPE over the same
  *    whitespace split every other text operator here uses. With an
  *    arbitrary merges list this yields BPE-STRUCTURED APPROXIMATE
  *    counts that compose with the rest of the pipeline — but released
  *    byte-level merges files (the GPT-2/HF format) are written over
  *    byte-to-unicode-mapped text with Ġ space markers, and this mode
  *    never fires those merges (punctuation also stays glued to its
  *    word), so counts diverge from the releasing tokenizer's.
  *  - `byteLevel = true`: faithful BYTE-LEVEL BPE for released merges
  *    files — the GPT-2-style pre-tokenizer regex (contractions split
  *    off, a leading space attaches to the following word, letter /
  *    number / punctuation runs separate), each pre-token UTF-8 encoded
  *    and mapped through the public bytes-to-unicode table (space →
  *    'Ġ'), merges run over the mapped symbols. Counts then match the
  *    tokenizer that shipped the file (modulo its special tokens).
  *
  * Semantics per word/pre-token: split into single symbols, then the
  * present pair with the LOWEST merge rank is merged repeatedly —
  * leftmost occurrence on equal ranks — until no listed pair remains.
  * Symbols never covered by the merges stay single-symbol tokens (no
  * unk).
  *
  * Scale design: the ranks map rides to executors once per task via the
  * closure (vocab-sized, dim-scale by contract); encoding is pure per-row
  * CPU inside mapPartitions with a per-partition pre-token→length memo —
  * under Zipfian word frequency the memo turns the per-doc cost into a
  * hit on the few thousand hot words, exactly like a real tokenizer's
  * cache.
  */
final class Bpe(merges: Seq[(String, String)], val byteLevel: Boolean = false)
    extends Serializable {

  // first occurrence of a duplicated pair wins (plain toMap would keep
  // the LAST index — the opposite of merge-priority order)
  private val rank: Map[(String, String), Int] =
    merges.zipWithIndex.reverseIterator.toMap

  /** BPE token sequence for one pre-token (a whitespace-free word in
    * char mode; any byte-to-unicode-mapped pre-token in byte mode).
    */
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
    * null convention). `memo` caches per-pre-token lengths across calls;
    * keys are the RAW pre-tokens, so " the" and "the" memo separately in
    * byte mode.
    */
  def countTokens(text: String,
                  memo: scala.collection.mutable.Map[String, Int]): Long =
    if (text == null) 0L
    else if (byteLevel) {
      var n = 0L
      val m = Bpe.Gpt2PreTok.matcher(text)
      while (m.find()) {
        val w = m.group()
        if (memo.size >= Bpe.MemoCap) memo.clear()
        n += memo.getOrElseUpdate(w, encodeWord(Bpe.toByteUnicode(w)).length)
      }
      n
    } else {
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

  /** The GPT-2-style byte-level pre-tokenizer (public pattern from the
    * open tokenizer releases): contractions, optional-space + letter
    * runs, optional-space + digit runs, optional-space + punctuation
    * runs, then whitespace (a run keeps its last space for the next
    * word via the lookahead). UNICODE_CHARACTER_CLASS makes \s/\p{L}
    * match their Unicode categories like the reference implementations.
    */
  private[graft] val Gpt2PreTok = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The public bytes-to-unicode table: printable ASCII and two Latin-1
    * runs map to themselves; every other byte value b maps to
    * (256 + k) for the k-th such byte — space (0x20) lands on 'Ġ'
    * (U+0120), newline on 'Ċ'. One char per byte, bijective, so merges
    * files written over mapped text apply directly.
    */
  private[graft] val ByteToUnicode: Array[Char] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (self(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** A pre-token's UTF-8 bytes mapped through [[ByteToUnicode]] — the
    * symbol string byte-level merges are written over.
    */
  private[graft] def toByteUnicode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(ByteToUnicode(b & 0xFF)))
    sb.toString
  }

  /** Parse the public merges-file format: one "left right" pair per
    * line, rank = line order; blank lines and `#...` headers skipped.
    * `byteLevel = true` for files released by byte-level tokenizers
    * (GPT-2/HF style — Ġ-marked merges).
    */
  def fromMergesLines(lines: Iterator[String], byteLevel: Boolean = false): Bpe =
    new Bpe(lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"malformed merges line: '$l'")
        (sp(0), sp(1))
      }.toSeq, byteLevel)

  /** Append a BPE token-count column to `docs` — the drop-in producer for
    * [[TextAnalysis.packPlanOn]] / [[TextAnalysis.packingStatsOn]] /
    * [[TextAnalysis.mixRebalanceOn]] / [[TextAnalysis.mixTemperatureOn]],
    * so packing and mix decisions run in tokenizer units (faithful ones
    * when `bpe.byteLevel` — the mode travels with the Bpe instance).
    * Pure mapPartitions (no shuffle, no join); every input column passes
    * through untouched.
    */
  /** TRAIN a character-BPE merges list from the corpus — the classic
    * Sennrich greedy algorithm at this engine's altitude: the WORD
    * FREQUENCY table is the distributed part (one map-side-combined
    * count over the text scan; under Zipf the distinct-word vocabulary
    * is dim-scale by contract, like IVF's centroid matrix), and the
    * merge loop runs driver-side over that table exactly where reference
    * implementations run it. FULLY DETERMINISTIC where textbook BPE is
    * tie-unstable: each round's winner is (count DESC, left ASC, right
    * ASC), so any engine, partitioning, or rerun writes the same merges
    * file — and the result feeds [[Bpe]]'s encoder directly (char mode),
    * closing the loop: the engine can train the tokenizer whose units
    * its own packing/mix operators then budget in.
    *
    * Stops early when no pair reaches `minCount` (merging singletons
    * memorizes the corpus tail — the standard cutoff).
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
                  minCount: Long = 2): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val vocab = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some((pair, c)) if c >= minCount =>
          merges += pair
          val joined = pair._1 + pair._2
          seqs = seqs.map { case (syms, cnt) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                b += joined; i += 2 // leftmost-first, non-overlapping
              } else { b += syms(i); i += 1 }
            }
            (b.result(), cnt)
          }
        case _ => done = true
      }
    }
    merges.toSeq
  }

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
