package graft

import graft.ops.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._

class BpeSpecs extends SparkSpec {
  import spark.implicits._

  // tiny in-repo merges vocab (public merges-file format: ranked pairs)
  private val MergesLines = Seq(
    "#version: test",
    "",
    "a b",   // rank 0
    "ab c",  // rank 1
    "c d",   // rank 2
    "e e")   // rank 3

  private val bpe = Bpe.fromMergesLines(MergesLines.iterator)

  test("bpe encode: hand-computed fixtures, lowest rank first, leftmost on ties") {
    // abcd: (a,b)=r0 -> [ab,c,d]; (ab,c)=r1 -> [abc,d]; no pair left
    assert(bpe.encodeWord("abcd") == Vector("abc", "d"))
    // cd merges by r2 even though r0/r1 don't apply
    assert(bpe.encodeWord("cd") == Vector("cd"))
    // eeee: (e,e)=r3 at indices 0/1/2 — LEFTMOST wins each round:
    // [ee,e,e] -> [ee,ee]; (ee,ee) unlisted -> done
    assert(bpe.encodeWord("eeee") == Vector("ee", "ee"))
    // a DUPLICATED merge pair keeps its FIRST (best) rank — plain toMap
    // would keep the last index and invert the merge priority
    val dup = new Bpe(Seq(("a", "b"), ("b", "c"), ("a", "b")))
    assert(dup.encodeWord("abc") == Vector("ab", "c"))
    // uncovered chars stay single-character tokens (no unk)
    assert(bpe.encodeWord("xyz") == Vector("x", "y", "z"))
    assert(bpe.encodeWord("x") == Vector("x"))
    assert(bpe.encodeWord("") == Vector())
  }

  test("bpe count: whitespace pretokenization, memo, null -> 0") {
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    // "abcd cd xyz" -> 2 + 1 + 3
    assert(bpe.countTokens("abcd  cd\txyz", memo) == 6L)
    assert(memo("abcd") == 2 && memo("cd") == 1 && memo("xyz") == 3)
    assert(bpe.countTokens(null, memo) == 0L)
    assert(bpe.countTokens("   ", memo) == 0L)
  }

  test("withTokens: passthrough columns, counts match, no shuffle in plan") {
    val docs = Seq(
      (1L, "abcd cd", "en"), (2L, "eeee eeee eeee", "de"),
      (3L, null: String, "en"), (4L, "xyz", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Bpe.withTokens(docs, bpe)
    assert(got.columns.toSeq == Seq("doc_id", "text", "lang", "n_tokens"))
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"),
      "BPE tokenization must be map-only")
    val m = got.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m == Map(1L -> 3L, 2L -> 6L, 3L -> 0L, 4L -> 3L))
  }

  test("pack plan on bpe tokens: real-tokenizer layout, hand-checked") {
    val docs = Seq(
      (1L, "abcd abcd", "en"),  // 4 bpe tokens
      (2L, "eeee", "en"),       // 2
      (3L, "xyz", "en"),        // 3
      (4L, "cd cd cd", "de"))   // 3
      .toDF("doc_id", "text", "lang")
    val toks = Bpe.withTokens(docs, bpe).select(col("doc_id"), col("lang"), col("n_tokens"))
    val plan = TextAnalysis.packPlanOn(toks, capacity = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // en stream in doc_id order: doc1 tokens [0,4) = seq0 whole;
    // doc2 [4,6) = seq1 offset 0; doc3 [6,9) straddles seq1->seq2
    assert(plan(1L) == ((4L, 0L, 0L, 1L)))
    assert(plan(2L) == ((2L, 1L, 0L, 1L)))
    assert(plan(3L) == ((3L, 1L, 2L, 2L)))
    // de stream independent: doc4 [0,3) = seq0
    assert(plan(4L) == ((3L, 0L, 0L, 1L)))
    // and the whitespace default remains the packPlan(docs) behavior:
    // same layout arithmetic, different (estimate) units
    val ws = TextAnalysis.packPlan(docs, capacity = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ws(1L) == 2L && ws(4L) == 3L)
  }

  test("byte-level bpe: bytes-to-unicode table, gpt2 pre-tok, hand-computed counts") {
    import scala.collection.mutable
    // the public table's two landmark mappings: space -> Ġ (U+0120),
    // newline -> Ċ (U+010A); printable ascii maps to itself
    assert(Bpe.toByteUnicode(" ") == "Ġ")
    assert(Bpe.toByteUnicode("\n") == "Ċ")
    assert(Bpe.toByteUnicode("the") == "the")
    // é is two UTF-8 bytes, both self-mapped latin-1: Ã (0xC3) © (0xA9)
    assert(Bpe.toByteUnicode("é") == "Ã©")
    // Ġ-marked merges — the shape released byte-level files actually have
    val lines = Seq("#version: test", "Ġ t", "Ġt h", "Ġth e")
    val byteBpe = Bpe.fromMergesLines(lines.iterator, byteLevel = true)
    val charBpe = Bpe.fromMergesLines(lines.iterator)
    val memo = mutable.HashMap.empty[String, Int]
    // "a the": pre-tokens [a][ the]; Ġthe merges to ONE token via the
    // Ġ chain — 2 total. The char-BPE whitespace mode can never fire a
    // Ġ merge: "the" stays 3 singles — 4 total (the documented
    // divergence the byte mode exists to close)
    assert(byteBpe.countTokens("a the", memo) == 2L)
    assert(charBpe.countTokens("a the", mutable.HashMap.empty[String, Int]) == 4L)
    // punctuation splits off its word: [the][,][ the] -> 3 + 1 + 1
    assert(byteBpe.countTokens("the, the", memo) == 5L)
    // contractions split: [don]['t] -> 3 + 2
    assert(byteBpe.countTokens("don't", memo) == 5L)
    // a multi-space run: [a][ ][ b] -> 1 + 1 + 2 (inner space becomes Ġ)
    assert(byteBpe.countTokens("a  b", memo) == 4L)
    // multi-byte char: é = 2 mapped symbols, no merge -> 2; with the
    // "Ã ©" merge line -> 1
    assert(byteBpe.countTokens("é", memo) == 2L)
    val accented = Bpe.fromMergesLines(Seq("Ã ©").iterator, byteLevel = true)
    assert(accented.countTokens("é", mutable.HashMap.empty[String, Int]) == 1L)
    assert(byteBpe.countTokens(null, memo) == 0L)
    // the mode travels with the instance through withTokens
    val docs = Seq((1L, "a the"), (2L, "the, the")).toDF("doc_id", "text")
    val got = Bpe.withTokens(docs, byteBpe).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 2L -> 5L))
  }

  test("trainMerges: the textbook low/lower/lowest trace, then round-trip encode") {
    import spark.implicits._
    // word freqs {low:3, lower:1, lowest:1}: round 1 ties (l,o) and (o,w)
    // at 5 -> lex order picks (l,o); then (lo,w):5; then (low,e):2; all
    // remaining pairs are singletons -> minCount=2 stops training
    val docs = Seq((1L, "low low lower"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val merges = graft.ops.Bpe.trainMerges(docs, numMerges = 10)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")), merges.toString)
    // the trained file drives the encoder directly (char mode)
    val bpe = new graft.ops.Bpe(merges)
    assert(bpe.encodeWord("lowest") == Vector("lowe", "s", "t"))
    assert(bpe.encodeWord("low") == Vector("low"))
    assert(bpe.encodeWord("slow") == Vector("s", "low"),
      "mid-word pairs still merge by rank")
  }

  test("trainMerges: deterministic under repartitioning") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"alpha beta gamma${i % 5}"))
      .toDF("doc_id", "text")
    val a = graft.ops.Bpe.trainMerges(docs, 8)
    val b = graft.ops.Bpe.trainMerges(docs.repartition(7), 8)
    assert(a == b, s"$a vs $b")
    assert(a.nonEmpty)
  }

  test("bpe properties: lossless segmentation, monotone counts, random vocabularies") {
    import org.scalacheck.{Gen, rng}
    val genChar = Gen.oneOf('a', 'b', 'c', 'd')
    val genWord = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, genChar)
    } yield cs.mkString
    val genShort = for {
      n <- Gen.chooseNum(1, 3)
      cs <- Gen.listOfN(n, genChar)
    } yield cs.mkString
    val genMerges = for {
      n <- Gen.chooseNum(0, 12)
      ls <- Gen.listOfN(n, genShort)
      rs <- Gen.listOfN(n, genShort)
    } yield ls.zip(rs)
    (1 to 60).foreach { seed =>
      val merges = genMerges.apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      val b = new Bpe(merges)
      (1 to 10).foreach { ws =>
        val w = genWord.apply(Gen.Parameters.default, rng.Seed((seed * 100 + ws).toLong)).get
        val toks = b.encodeWord(w)
        // segmentation is LOSSLESS: tokens concatenate back to the word
        assert(toks.mkString == w, s"lossy encode of '$w' with $merges")
        // every merge shrinks by one: 1 <= |tokens| <= |word|
        assert(toks.nonEmpty && toks.length <= w.length)
        // no adjacent pair still mergeable (fixpoint reached)
        val ranks = merges.zipWithIndex.toMap
        toks.zip(toks.drop(1)).foreach { p =>
          assert(!ranks.contains(p), s"unapplied merge $p in $toks")
        }
      }
    }
  }

  test("packing stats + mix rebalance accept the bpe token frame drop-in") {
    val docs = Seq(
      (1L, "abcd abcd", "src0", "en"), (2L, "eeee", "src0", "en"),
      (3L, "xyz xyz xyz", "src1", "de"))
      .toDF("doc_id", "text", "source", "lang")
    val toks = Bpe.withTokens(docs, bpe)
    val stats = TextAnalysis.packingStatsOn(
      toks.select(col("source"), col("n_tokens")), ctx = 4).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats == Map("src0" -> 6L, "src1" -> 9L))
    val mix = TextAnalysis.mixRebalanceOn(
      toks.select(col("doc_id"), col("lang"), col("n_tokens"))).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // en has 6 bpe tokens, de 9 -> de rate 6/9, en rate 1.0
    assert(mix.filter(m => m._1 <= 2).forall(_._3 == 1.0))
    assert(mix.find(_._1 == 3L).exists(m => math.abs(m._3 - 0.666667) < 1e-6))
  }
}
