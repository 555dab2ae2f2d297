package graft

import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
    (2L, "completely different text about spark query engines and shuffles here"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today")) // exact dup of 0
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("substring dedup scrubs corpus-repeated spans below doc level") {
    val d = Seq(
      (0L, "a b c x y z"),   // spans: "a b c" (shared), "x y z" (unique)
      (1L, "a b c q r s"),   // spans: "a b c" (shared), "q r s" (unique)
      (2L, "a b c"))         // single span, shared → fully scrubbed
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, window = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def md5s(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(0L).getAs[Long]("n_spans") == 2L)
    assert(out(0L).getAs[Long]("n_repeated_spans") == 1L)
    assert(out(0L).getAs[Double]("dup_ratio") == 0.5)
    assert(out(0L).getAs[String]("clean_fp") == md5s("x y z"))
    assert(out(1L).getAs[String]("clean_fp") == md5s("q r s"))
    // every span repeated → clean_fp of the empty string, ratio 1
    assert(out(2L).getAs[Double]("dup_ratio") == 1.0)
    assert(out(2L).getAs[String]("clean_fp") == md5s(""))
    // a doc with no corpus-repeated spans is untouched
    val solo = Dedup.substringDedup(Seq((9L, "u v w")).toDF("doc_id", "text"), 3)
      .collect().head
    assert(solo.getAs[Long]("n_repeated_spans") == 0L &&
      solo.getAs[String]("clean_fp") == md5s("u v w"))
  }

  test("substring dedup catches cross-doc repeats at ANY grid alignment") {
    // the shared run "A B C D E" (2*window-1 words) sits at word offset 3
    // in doc 0 and offset 2 in doc 1 — offsets differ by a non-multiple
    // of the window, so the r7 non-overlapping grid hashed disjoint spans
    // and missed it; the stride-1 probe stream must flag a full grid span
    // inside the run in BOTH docs (the >= 2w-1 guarantee of the contract)
    val d = Seq(
      (0L, "p1 p2 A B C D E q1"), // grid: [p1 p2 A][B C D][E q1]
      (1L, "r1 A B C D E s1 s2")) // grid: [r1 A B][C D E][s1 s2]
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, window = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def md5s(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // doc 0's "B C D" occurs in doc 1's shingles (and vice versa "C D E")
    assert(out(0L).getAs[Long]("n_repeated_spans") == 1L,
      "misaligned cross-doc repeat must be flagged in doc 0")
    assert(out(1L).getAs[Long]("n_repeated_spans") == 1L,
      "misaligned cross-doc repeat must be flagged in doc 1")
    assert(out(0L).getAs[String]("clean_fp") == md5s("p1 p2 A E q1"))
    assert(out(1L).getAs[String]("clean_fp") == md5s("r1 A B s1 s2"))
    // sub-window shared content ("D E" inside distinct spans) alone must
    // NOT flag anything: window granularity is the documented floor
    val sub = Dedup.substringDedup(Seq(
      (0L, "a b c D E"), (1L, "x D E y z")).toDF("doc_id", "text"), 3)
      .collect()
    assert(sub.forall(_.getAs[Long]("n_repeated_spans") == 0L))
  }

  test("incremental dedup screens a new batch against the existing corpus only") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "completely different text about spark query engines and shuffles here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"), // == 100
      (2L, "utterly novel content with no overlap whatsoever in any shingle window"),
      (3L, "too short")) // sub-3-word: no signature → trivially novel
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 3)
    assert(!out(1L).getAs[Boolean]("novel") &&
      out(1L).getAs[Long]("best_match") == 100L &&
      out(1L).getAs[Double]("best_est") == 1.0)
    assert(out(2L).getAs[Boolean]("novel"))
    assert(out(3L).getAs[Boolean]("novel") && out(3L).getAs[Long]("n_candidates") == 0L)
    // corpus docs never appear on the output side
    assert(!out.contains(100L) && !out.contains(101L))
  }

  test("incremental dedup: oversized corpus buckets screen via hash-sampled reps") {
    // 150 identical corpus docs -> every band is one >maxBucket bucket;
    // the new doc screens against the numReps=8 hash-sampled members
    // (band-independent sample: each band draws the same 8 ids), never
    // the whole bucket
    val corpus = (1L to 150L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, maxBucket = 100).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_candidates") == 8L,
      s"expected the 8-rep screen, got ${r.getAs[Long]("n_candidates")}")
    assert(!r.getAs[Boolean]("novel") && r.getAs[Double]("best_est") == 1.0)
    // best match = the lowest-id sampled rep (hash order, ties impossible)
    val byHash = corpus.select(col("doc_id"),
        Dedup.hash32(col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
    assert(r.getAs[Long]("best_match") == byHash.take(8).map(_._1).min)
  }

  test("minhash LSH surfaces near-duplicate pairs with high est jaccard") {
    val pairs = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("est_jaccard")))
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 3L && j == 1.0 })
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j > 0.5 })
    assert(!pairs.exists { case (a, b, _) => b == 2L || a == 2L })
  }

  test("ngram jaccard verifies candidates exactly") {
    val out = Dedup.ngramJaccard(docs, 0.5).collect()
      .map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")), r.getAs[Double]("jaccard"))).toMap
    assert(out((0L, 3L)) == 1.0)
    assert(out((0L, 1L)) > 0.7 && out((0L, 1L)) < 1.0)
  }

  test("simhash near-dup finds low-hamming pairs") {
    val out = Dedup.simhashNearDup(docs).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Long]("hamming")))
    assert(out.exists { case (a, b, h) => a == 0L && b == 3L && h == 0L })
  }

  test("clusters: min-label components over a chained pair graph") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair 7-9: components {1,2,3} and {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("corpusDedup keeps exactly one doc per near-dup cluster") {
    val d = Tables.table(spark, Sf0001, "documents")
    val out = Dedup.corpusDedup(d).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.values.forall(_.count(_.getAs[Boolean]("keep")) == 1))
  }

  test("clusters with a reliable checkpoint dir (cluster fault-tolerance path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
      val out = Dedup.clusters(pairs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // the reliable path actually wrote checkpoint data
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try assert(it.filter(java.nio.file.Files.isRegularFile(_)).count() > 0)
      finally it.close()
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("oversized buckets pair via hash-sampled reps + stride-1/2 ring, and still cluster") {
    // 150 identical docs land in one >maxBucket bucket in every band
    val d = (1L to 150L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(d, maxBucket = 100)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // reps = first 8 ids in (md5-prefix(doc_id), doc_id) order — the
    // content-hash sample (hash32 itself is pinned against the composed
    // builtins form in a separate test); each member pairs with every
    // rep, plus doc_id-ring pairing at strides 1 and 2; nothing else
    val byHash = d.select(col("doc_id"),
        Dedup.hash32(col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
    val reps = byHash.take(8).map(_._1).toSet
    val rep = for { r <- reps; j <- 1L to 150L; if j != r }
      yield (math.min(r, j), math.max(r, j))
    val ring = (1L to 149L).map(j => (j, j + 1)).toSet ++
      (1L to 148L).map(j => (j, j + 2)).toSet
    assert(pairs == (rep.toSet ++ ring))
    // downstream clustering reunites the whole duplicate set
    val kept = Dedup.corpusDedup(d).where(col("keep")).count()
    assert(kept == 1)
  }

  test("native signature expressions match composed-builtins forms") {
    val d = Tables.table(spark, Sf0001, "documents")
    val nat = Dedup.minhashSignatures(d, 32).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("sig")).toMap
    val com = Dedup.minhashSignaturesComposed(d, 32).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("sig")).toMap
    assert(nat == com)
    val natS = Dedup.simhashSignatures(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val comS = Dedup.simhashSignaturesComposed(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(natS == comS)
    // native md5-prefix hash == conv(substring(md5)) composed form
    val h = d.select(
      Dedup.hash32(col("text")).as("n32"), Dedup.hash32Composed(col("text")).as("c32"),
      Dedup.hash60(col("text")).as("n60"), Dedup.hash60Composed(col("text")).as("c60"))
    assert(h.where(col("n32") =!= col("c32") || col("n60") =!= col("c60")).count() == 0)
  }

  test("sf0.001 corpus: minhash candidates are confirmed by true jaccard") {
    val d = Tables.table(spark, Sf0001, "documents")
    val verified = Dedup.ngramJaccard(d, 0.8).collect()
    assert(verified.nonEmpty)
    assert(verified.forall(_.getAs[Double]("jaccard") >= 0.8))
  }
  // ---- cross-source duplication matrix (wave 11) ----

  test("crossSourceDups: hand matrix, canonical pair order, overlap coefficient") {
    import spark.implicits._
    val d = Seq(
      (1L, "x", "s1"), (2L, "y", "s1"), (3L, "z", "s1"),
      (4L, "x", "s2"), (5L, "y", "s2"),
      (6L, "x", "s3"),
      (7L, "x", "s1"), // duplicate WITHIN s1: must not inflate n_a
      (8L, "w", "s4")  // disjoint source: zero-filled rows, never absent
    ).map { case (id, t, src) => (id, t, src) }.toDF("doc_id", "text", "source")
    val byPair = graft.ops.Dedup.crossSourceDups(d).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        ((x.getAs[Long]("n_shared"), x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
          x.getAs[Double]("overlap")))).toMap
    assert(byPair(("s1", "s2")) == ((2L, 3L, 2L, 1.0)), byPair.toString)
    assert(byPair(("s1", "s3")) == ((1L, 3L, 1L, 1.0)), byPair.toString)
    assert(byPair(("s2", "s3")) == ((1L, 2L, 1L, 1.0)), byPair.toString)
    // the complete 4-source matrix: 6 pairs, s4's rows zero-filled
    assert(byPair.size == 6, byPair.toString)
    assert(byPair(("s1", "s4")) == ((0L, 3L, 1L, 0.0)), byPair.toString)
    assert(byPair(("s2", "s4")) == ((0L, 2L, 1L, 0.0)), byPair.toString)
    assert(byPair(("s3", "s4")) == ((0L, 1L, 1L, 0.0)), byPair.toString)
    assert(byPair.keys.forall { case (a, b) => a < b }, "canonical order")
  }

  // ---- span-level dedup (wave 14) ----

  test("spanDedup: first-occurrence keeper, doc rewrite, exact-dup collapse") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"), // spans: "a b", "c d", "e" — all first
      (2L, "a b x y"),   // "a b" seen in doc 1; keeps "x y"
      (3L, "a b c d e")  // exact dup of doc 1: keeps nothing
    ).toDF("doc_id", "text")
    val r = Dedup.spanDedup(d, w = 2).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_spans") == 3 && r(1L).getAs[Long]("n_kept") == 3)
    assert(r(1L).getAs[String]("text") == "a b c d e")
    assert(r(2L).getAs[Long]("n_kept") == 1 &&
      r(2L).getAs[String]("text") == "x y")
    assert(r(3L).getAs[Long]("n_kept") == 0 &&
      r(3L).getAs[String]("text") == "")
    // conservation: kept spans across the corpus == distinct span contents
    val kept = r.values.map(_.getAs[Long]("n_kept")).sum
    assert(kept == 4, s"a b | c d | e | x y = 4 distinct spans, got $kept")
  }

  test("spanDedup: partitioning-invariant on the real corpus") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val a = Dedup.spanDedup(docs).orderBy("doc_id").collect().toSeq
    val b = Dedup.spanDedup(docs.repartition(7)).orderBy("doc_id")
      .collect().toSeq
    assert(a == b)
    // the corpus carries exact dups (dedup_exact finds them): at least one
    // doc must lose every span
    assert(a.exists(_.getAs[Long]("n_kept") == 0L))
    assert(a.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_spans")))
  }

  // ---- winnowing fingerprints (wave 10) ----

  test("winnowFingerprint: gram counts, short-doc conventions, dup identity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),        // 5 grams, full windows at pos 0..1
      (2L, "a b c d e f g h"),        // exact duplicate of doc 1
      (3L, "a b c"),                  // < k words: drops entirely
      (4L, "a b c d e")               // 2 grams < w: zero fingerprints
    ).toDF("doc_id", "text")
    val r = Dedup.winnowFingerprint(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r.contains(3L), "sub-k docs drop")
    assert(r(1L).getAs[Long]("n_grams") == 5L)
    val nf = r(1L).getAs[Long]("n_fingerprints")
    assert(nf >= 1L && nf <= 2L, s"two full windows select 1-2 mins: $nf")
    // identical content -> identical fingerprint profile
    assert(r(2L).getAs[Long]("n_fingerprints") == nf &&
      r(2L).getAs[Long]("min_fp") == r(1L).getAs[Long]("min_fp"))
    assert(r(4L).getAs[Long]("n_grams") == 2L &&
      r(4L).getAs[Long]("n_fingerprints") == 0L &&
      r(4L).isNullAt(r(4L).fieldIndex("min_fp")))
  }

  test("winnowFingerprint: density near 2/(w+1) on the real corpus, repartition-stable") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val r = Dedup.winnowFingerprint(docs)
    val d = r.agg(avg(col("fp_density"))).head().getDouble(0)
    // theoretical density for random hashes is 2/(w+1) = 0.4
    assert(d > 0.25 && d < 0.55, s"density $d")
    val a = r.orderBy("doc_id").collect().toSeq
    val b = Dedup.winnowFingerprint(docs.repartition(7)).orderBy("doc_id")
      .collect().toSeq
    assert(a == b, "winnowing must be partitioning-invariant")
  }

  // ---- ExactSubstr longest repeat (r11) ----

  test("longestRepeat: planted cross-doc span, exact length and position") {
    import spark.implicits._
    val docs = Seq(
      // docs 1/2 share EXACTLY the 5-word run "p q r s t" (doc 1 at
      // pos 2, doc 2 at pos 0); contexts differ on both sides
      (1L, "x y p q r s t u v"),
      (2L, "p q r s t m n"),
      // doc 3 shares nothing — not even a single word
      (3L, "zz ww kk"),
      // doc 4: overlapping SELF-repeat "a a a a" -> suffixes at pos 0/1
      // share a 3-word prefix (the Lee et al. overlapping convention)
      (4L, "a a a a")
    ).toDF("doc_id", "text")
    val r = graft.ops.Dedup.longestRepeat(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 5L && r(1L).getLong(2) == 2L)
    assert(r(2L).getLong(1) == 5L && r(2L).getLong(2) == 0L)
    assert(r(3L).getLong(1) == 0L && r(3L).isNullAt(2))
    assert(r(4L).getLong(1) == 3L && r(4L).getLong(2) == 0L)
  }

  test("longestRepeat: exact duplicates clamp at the cap; cap is the knob") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val r32 = graft.ops.Dedup.longestRepeat(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r32(1L) == 32L && r32(2L) == 32L, "40-word dup clamps at cap 32")
    val r8 = graft.ops.Dedup.longestRepeat(docs, cap = 8).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r8(1L) == 8L, "smaller cap clamps lower")
  }

  test("longestRepeat: real corpus — dup docs hit the cap, " +
    "partitioning-invariant") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val r = graft.ops.Dedup.longestRepeat(docs)
    val a = r.orderBy("doc_id").collect().toSeq
    // the corpus contains exact-duplicate texts (dedup_exact's fixture):
    // their docs must clamp at the cap
    assert(a.map(_.getLong(1)).max == 32L)
    val b = graft.ops.Dedup.longestRepeat(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "suffix order + LCP must be partitioning-invariant")
  }

  // ---- ExactSubstr removal (r11e) ----

  private def prune(d: org.apache.spark.sql.DataFrame, w: Int = 8) =
    graft.ops.Dedup.exactSubstrPrune(d, w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text")))).toMap

  test("exactSubstrPrune: planted cross-doc 8-word span vanishes from " +
    "BOTH docs; context words survive in order") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"A$i").mkString(" ")
    val d = Seq(
      (1L, s"x y $span u v"),
      (2L, s"$span m n"),
      (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val r = prune(d)
    assert(r(1L) == ((12L, 8L, "x y u v")))
    assert(r(2L) == ((10L, 8L, "m n")))
    assert(r(3L) == ((5L, 0L, "nothing shared here at all")))
  }

  test("exactSubstrPrune: within-doc overlapping self-repeat removed; " +
    "a 9-word repeat is FULLY covered by its two overlapping 8-grams") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"A$i").mkString(" ")
    val run9 = (1 to 9).map(i => s"B$i").mkString(" ")
    val d = Seq(
      (1L, s"$span z $span"),  // self-repeat: both occurrences go
      (2L, s"c1 $run9 c2"),
      (3L, s"d1 $run9 d2")).toDF("doc_id", "text")
    val r = prune(d)
    assert(r(1L) == ((17L, 16L, "z")))
    assert(r(2L) == ((11L, 9L, "c1 c2")), "overlap chaining must cover all 9")
    assert(r(3L) == ((11L, 9L, "d1 d2")))
  }

  test("exactSubstrPrune: sub-w docs untouched even when identical; " +
    "7-word repeats survive w=8") {
    import spark.implicits._
    val run7 = (1 to 7).map(i => s"S$i").mkString(" ")
    val d = Seq(
      (1L, "short text here"), (2L, "short text here"),
      (3L, s"c1 $run7 c2"), (4L, s"d1 $run7 d2")).toDF("doc_id", "text")
    val r = prune(d)
    assert(r(1L)._2 == 0L && r(2L)._2 == 0L, "no 8-gram exists in 3 words")
    assert(r(3L) == ((9L, 0L, s"c1 $run7 c2")),
      "a 7-word repeat is below the w=8 floor")
    // ... and at w=7 the same corpus scrubs the run from both docs
    val r7 = prune(d, w = 7)
    assert(r7(3L) == ((9L, 7L, "c1 c2")) && r7(4L) == ((9L, 7L, "d1 d2")))
  }

  test("exactSubstrPrune: real corpus — every doc present, exact-dup " +
    "docs fully scrubbed, partitioning-invariant") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val out = graft.ops.Dedup.exactSubstrPrune(docs)
    val a = out.orderBy("doc_id").collect().toSeq
    assert(a.size == docs.count(), "spine: one row per input document")
    // the corpus contains exact-duplicate ≥8-word texts (dedup_exact's
    // fixture): every position of such a doc is covered
    assert(a.exists(r => r.getLong(1) >= 8L && r.getLong(2) == r.getLong(1)
      && r.getString(3).isEmpty))
    // conservation: kept word count == words in the rewritten text
    a.foreach { r =>
      val keptWords =
        if (r.getString(3).isEmpty) 0L
        else r.getString(3).split("\\s+").length.toLong
      assert(r.getLong(1) - r.getLong(2) == keptWords)
    }
    val b = graft.ops.Dedup.exactSubstrPrune(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "coverage + rebuild must be partitioning-invariant")
  }

  // ---- guarded packed keys (r11g) ----

  test("packKey20: valid keys pack exactly; headroom violations raise " +
    "LOUDLY instead of silently colliding") {
    import spark.implicits._
    val ok = Seq((5L, 7L)).toDF("id", "idx")
      .select(graft.ops.Dedup.packKey20(col("id"), col("idx")).as("pk"))
      .head().getLong(0)
    assert(ok == 5L * 1048576L + 7L)
    for (bad <- Seq((1L, 1048576L), (1L, -1L), (-1L, 0L), (1L << 43, 0L))) {
      val e = intercept[Exception] {
        Seq(bad).toDF("id", "idx")
          .select(graft.ops.Dedup.packKey20(col("id"), col("idx")))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("headroom")), s"$bad: $e")
    }
    // the guarded face end-to-end: a >2^20 frame index raises
    val e2 = intercept[Exception] {
      graft.ops.Multimodal.frameDhash(
        Seq((1L, 1048576L, Array[Byte](1, 2, 3)))
          .toDF("doc_id", "frame_idx", "payload")).collect()
    }
    assert(String.valueOf(e2.getMessage).contains("headroom") ||
      (e2.getCause != null &&
        String.valueOf(e2.getCause.getMessage).contains("headroom")))
  }

  // ---- benchmark span-scrub (r11e) ----

  test("spanScrub: quoted benchmark span removed at SPAN granularity; " +
    "own repeats and novel text survive; benchmark docs drop from output") {
    import spark.implicits._
    val bench = (1 to 8).map(i => s"Q$i").mkString(" ")
    val own = (1 to 8).map(i => s"R$i").mkString(" ")
    val d = Seq(
      (0L, s"$bench intro words", "src0"),      // the benchmark doc
      (1L, s"x y $bench u v", "web"),           // quotes the benchmark
      (2L, s"$own z $own", "web"),              // own repeat: NOT scrubbed
      (3L, "plain novel prose here", "web")).toDF("doc_id", "text", "source")
    val r = graft.ops.Dedup.spanScrub(d, col("source") === "src0").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_words"), x.getAs[Long]("n_removed"),
          x.getAs[String]("text")))).toMap
    assert(!r.contains(0L), "benchmark docs are not rewritten")
    assert(r(1L) == ((12L, 8L, "x y u v")), "exactly the quoted span goes")
    assert(r(2L) == ((17L, 0L, s"$own z $own")),
      "within-corpus repeats are exactsubstr_prune's job, not scrub's")
    assert(r(3L) == ((4L, 0L, "plain novel prose here")))
  }

  test("spanScrub: NULL benchPred folds to CORPUS — the row is scrubbed " +
    "and emitted, never silently dropped") {
    import spark.implicits._
    val bench = (1 to 8).map(i => s"Q$i").mkString(" ")
    val d = Seq(
      (0L, s"$bench tail", Some("src0")),
      (1L, s"pre $bench post", None),          // null source: CORPUS
      (2L, "novel words only here", None)).toDF("doc_id", "text", "source")
    val r = graft.ops.Dedup.spanScrub(d, col("source") === "src0").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_removed"), x.getAs[String]("text")))).toMap
    assert(r.keySet == Set(1L, 2L), "null-pred rows must survive as corpus")
    assert(r(1L) == ((8L, "pre post")), "and still get scrubbed")
    assert(r(2L) == ((0L, "novel words only here")))
  }

  test("spanScrub: partitioning-invariant on the real corpus and " +
    "does real work at w=8") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val a = graft.ops.Dedup.spanScrub(docs, col("source") === "src0")
      .orderBy("doc_id").collect().toSeq
    assert(a.nonEmpty && a.size ==
      docs.where(col("source") =!= "src0").count())
    val b = graft.ops.Dedup.spanScrub(docs.repartition(7),
      col("source") === "src0").orderBy("doc_id").collect().toSeq
    assert(a == b, "coverage + rebuild must be partitioning-invariant")
  }

  // ---- perceptual dHash: stub (oracled) face (r11) ----

  test("imageDhashStub: hand-computed md5-hex dHash, positive, repartition-stable") {
    val out = Multimodal.imageDhashStub(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 4)
    // every hash lives in [0, 2^63): bit 63 is never set
    assert(out.values.forall(h => h >= 0L))
    // hand replay for doc 0: luma i = md5-hex pair at (2i mod 31)+1,
    // bit r*8+c set when luma[r*9+c+1] > luma[r*9+c]
    val text = docs.where(col("doc_id") === 0L).head().getAs[String]("text")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def luma(i: Int): Int =
      Integer.parseInt(hex.substring((i * 2) % 31, (i * 2) % 31 + 2), 16)
    val expect = (0 until 63).map { b =>
      val r = b / 8; val c = b % 8
      if (luma(r * 9 + c + 1) > luma(r * 9 + c)) 1L << b else 0L
    }.reduce(_ | _)
    assert(out(0L) == expect, s"${out(0L)} vs $expect")
    // exact-dup texts (docs 0 and 3) hash identically
    assert(out(0L) == out(3L))
    val again = Multimodal.imageDhashStub(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("imageDedup: exact-content dups cluster at Hamming 0, keeper = min id") {
    val out = Dedup.imageDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(out.size == 4, "every document comes back")
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // docs 0 and 3 are byte-identical -> identical stub grid -> Hamming 0
    assert(byId(0L) == ((0L, true)) && byId(3L) == ((0L, false)))
    // unrelated md5s: pseudo-random 63-bit hashes stay singletons
    assert(byId(1L) == ((1L, true)) && byId(2L) == ((2L, true)))
  }

  test("videoFrameDhashStub: frame fan-out, per-frame md5 replay, repartition-stable") {
    val long0 = Seq.fill(40)("alpha beta gamma").mkString(" ")  // 679 chars -> 3 frames
    val d = Seq((0L, long0), (1L, "short clip"), (2L, long0))
      .toDF("doc_id", "text")
    val out = Multimodal.videoFrameDhashStub(d).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    // n_frames = min(1 + len div 256, 4): 679 -> 3, 10 -> 1
    assert(out.keySet == Set((0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L),
      (2L, 0L), (2L, 1L), (2L, 2L)))
    assert(out((0L, 0L))._1 == 3L && out((1L, 0L))._1 == 1L)
    // frames of one clip carry genuinely different hashes (distinct digests)
    assert(Set(out((0L, 0L))._2, out((0L, 1L))._2, out((0L, 2L))._2).size == 3)
    // exact-dup clips agree on EVERY frame
    assert((0L to 2L).forall(f => out((0L, f))._2 == out((2L, f))._2))
    // hand replay for (doc 1, frame 0): digest of text||'#0', hex-pair rule
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("short clip#0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def luma(i: Int): Int =
      Integer.parseInt(hex.substring((i * 2) % 31, (i * 2) % 31 + 2), 16)
    val expect = (0 until 63).map { b =>
      val r = b / 8; val c = b % 8
      if (luma(r * 9 + c + 1) > luma(r * 9 + c)) 1L << b else 0L
    }.reduce(_ | _)
    assert(out((1L, 0L))._2 == expect)
    val again = Multimodal.videoFrameDhashStub(d.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(again == out)
  }

  test("videoNearDup/videoFramesDedup: strict majority of ALIGNED frames") {
    import spark.implicits._
    // disjoint 5-bit block hashes: pairwise Hamming 10 (never "near"),
    // one-bit-flipped variants are Hamming 1 (always "near")
    def blk(i: Int): Long = 0x1FL << (6 * i)
    val frames = Seq(
      // A vs B: frames 0 (exact) and 1 (Hamming 1) match, frame 2 far -> 2/3
      (1L, 3L, 0L, blk(0)), (1L, 3L, 1L, blk(1)), (1L, 3L, 2L, blk(2)),
      (2L, 3L, 0L, blk(0)), (2L, 3L, 1L, blk(1) ^ (1L << 6)),
      (2L, 3L, 2L, blk(3)),
      // C shares ONLY frame 0 with A/B -> 1/3, stays apart
      (3L, 3L, 0L, blk(0)), (3L, 3L, 1L, blk(4)), (3L, 3L, 2L, blk(5)),
      // D (2 frames) vs E (3 frames): aligned = 2, both match -> majority
      (4L, 2L, 0L, blk(6)), (4L, 2L, 1L, blk(7)),
      (5L, 3L, 0L, blk(6)), (5L, 3L, 1L, blk(7) ^ (1L << 42)),
      (5L, 3L, 2L, blk(8)))
      .toDF("doc_id", "n_frames", "frame_idx", "dhash")
    val pairs = Dedup.videoNearDup(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(pairs.keySet == Set((1L, 2L), (4L, 5L)), pairs.toString)
    assert(pairs((1L, 2L)) == ((2L, 3L)) && pairs((4L, 5L)) == ((2L, 2L)))
    val out = Dedup.videoFramesDedup(frames).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, true)) && out(2L) == ((3L, 1L, false)))
    assert(out(3L) == ((3L, 3L, true)))
    assert(out(4L) == ((2L, 4L, true)) && out(5L) == ((3L, 4L, false)))
  }

  test("videoDedup end-to-end on the stub face: exact-dup clips cluster") {
    val out = Dedup.videoDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size == 4)
    assert(out(0L) == ((0L, true)) && out(3L) == ((0L, false)))
    assert(out(1L) == ((1L, true)) && out(2L) == ((2L, true)))
  }

  // ---- Heaps / corpus-growth curve (wave 8) ----

  test("heapsCurve: first occurrence decides the batch; duplicates add nothing") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a"), (1L, "b"),  // batch 0: both new
      (2L, "a"), (3L, "c"),  // batch 1: "a" is a dup -> 1 new
      (4L, "c"), (5L, "d")   // batch 2: "c" dup -> 1 new
    ).toDF("doc_id", "text")
    val r = Dedup.heapsCurve(docs, batchSize = 2L).orderBy("batch").collect()
      .map(x => (x.getAs[Long]("batch"), x.getAs[Long]("docs"),
        x.getAs[Long]("new_uniques"), x.getAs[Long]("cum_uniques"))).toSeq
    assert(r == Seq((0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L), (2L, 2L, 1L, 4L)),
      r.toString)
  }

  test("heapsCurve: a fully duplicated corpus flatlines after batch 0") {
    import spark.implicits._
    val docs = (0L until 12L).map(i => (i, "same")).toDF("doc_id", "text")
    val r = Dedup.heapsCurve(docs, batchSize = 4L).orderBy("batch").collect()
    assert(r.map(_.getAs[Long]("new_uniques")).toSeq == Seq(1L, 0L, 0L))
    assert(r.map(_.getAs[Long]("cum_uniques")).toSeq == Seq(1L, 1L, 1L))
    // conservation: cum at the tail equals the corpus's distinct contents
    assert(r.last.getAs[Long]("cum_uniques") ==
      docs.select(md5(col("text"))).distinct().count())
  }

  test("heapsCurve plan pin: the cumulative runs through Scan, not a Window") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"t${i % 7}")).toDF("doc_id", "text")
    // r10 verdict: the batch-spine cumulative must NOT be an unpartitioned
    // WindowExec (one-task at scale); Scan.withRunningTotal replaces it, so
    // the executed plan carries no Window operator at all.
    val plan = Dedup.heapsCurve(docs, batchSize = 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native codegen cosine == composed-builtins cosine") {
    val e = Tables.table(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.where(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q)).select(
      Similarity.cosine(col("v"), col("qv")).as("native"),
      Similarity.cosineComposed(col("v"), col("qv")).as("composed"))
    val bad = both.where(abs(col("native") - col("composed")) > lit(1e-12)).count()
    assert(bad == 0)
  }

  test("native lsh bucket matches composed-builtins bucket") {
    val e = Tables.table(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bad = e.select(
      Similarity.lshBucket(col("v")).as("nat"),
      Similarity.lshBucketComposed(col("v")).as("com"))
      .where(col("nat") =!= col("com")).count()
    assert(bad == 0)
  }

  test("lsh ANN returns results with reasonable recall vs brute force") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(spark, e, queries, 5)
      .select("qid", "id2").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(spark, e, queries, 5)
      .select("qid", "id2").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty, "multiprobe LSH must return candidates (zero-result regression)")
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall $recall too low")
    // OR-amplification: 4 independent tables must strictly improve on one
    val multi = Similarity.lshTopKMulti(spark, e, queries, 5)
      .select("qid", "id2").as[(Long, Long)].collect().toSet
    val recallMulti = (exact & multi).size.toDouble / exact.size
    info(s"recall single=$recall multi=$recallMulti")
    assert(recallMulti >= recall, s"multi-table recall $recallMulti below single $recall")
    assert(recallMulti >= 0.4, s"multi-table recall $recallMulti too low")
  }

  test("ivf ANN trains, probes cells, and recalls against brute force") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    import spark.implicits._
    val exact = Similarity.bruteForceTopK(spark, e, queries, 5)
      .select("qid", "id2").as[(Long, Long)].collect().toSet
    val ivf = graft.ops.Ivf.searchTopK(e, queries, 5)
      .select("qid", "id2").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"ivf recall $recall too low")
  }

  test("recall is monotone in the cost knob and full-probe IVF is exact") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(spark, e, queries, 5)
    // IVF: candidates grow as a superset with nprobe → recall never drops;
    // probing every cell scores the whole corpus → recall exactly 1
    val model = graft.ops.Ivf.train(e, 16, 2)
    val ivfCurve = Seq(1, 4, 16).map(p => Similarity.recallAtK(exact,
      graft.ops.Ivf.searchTopKWith(e, queries, 5, model, p)))
    assert(ivfCurve.sliding(2).forall(w => w(0) <= w(1)), s"ivf curve $ivfCurve")
    assert(ivfCurve.last == 1.0, s"full-probe ivf must be exact: $ivfCurve")
    // multi-LSH: tables 0..T-1 ⊆ 0..T → candidate superset → monotone
    val lshCurve = Seq(1, 2, 4).map(t => Similarity.recallAtK(exact,
      Similarity.lshTopKMulti(spark, e, queries, 5, numTables = t)))
    assert(lshCurve.sliding(2).forall(w => w(0) <= w(1)), s"lsh curve $lshCurve")
    info(s"ivf nprobe 1/4/16: $ivfCurve; lsh tables 1/2/4: $lshCurve")
  }

  test("ivf model persists to parquet and serves identically after reload") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val model = graft.ops.Ivf.train(e)
    val path = java.nio.file.Files.createTempDirectory("ivf_model").toString + "/m"
    graft.ops.Ivf.saveModel(spark, model, path)
    val loaded = graft.ops.Ivf.loadModel(spark, path)
    assert(loaded.length == model.length &&
      loaded.zip(model).forall { case (a, b) => a.sameElements(b) })
    import spark.implicits._
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id2", "cos").as[(Long, Long, Double)].collect().toSet
    assert(run(graft.ops.Ivf.searchTopKWith(e, queries, 5, loaded)) ==
      run(graft.ops.Ivf.searchTopKWith(e, queries, 5, model)))
  }

  test("embedding profile reports per-dimension stats") {
    val p = graft.ops.Similarity.embeddingProfile(
      Tables.table(spark, Sf0001, "embeddings")).collect()
    assert(p.length == 64) // one row per dimension
    assert(p.forall(r => r.getAs[Long]("n") == p.head.getAs[Long]("n")))
    assert(p.forall(r => r.getAs[Double]("min_x") <= r.getAs[Double]("max_x")))
  }

  test("pre-trained ivf search equals the self-training path, without re-running Lloyd") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    import spark.implicits._
    val model = graft.ops.Ivf.train(e) // train ONCE
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id2", "cos").as[(Long, Long, Double)].collect().toSet
    val selfTrained = run(graft.ops.Ivf.searchTopK(e, queries, 5))
    // two searches against the shared model: both equal the one-shot path
    assert(run(graft.ops.Ivf.searchTopKWith(e, queries, 5, model)) == selfTrained)
    assert(run(graft.ops.Ivf.searchTopKWith(e, queries, 5, model)) == selfTrained)
  }

  test("blocked exact pair search matches the all-pairs reference") {
    val e = Tables.table(spark, Sf0001, "embeddings")
    val blocked = Similarity.nearDupPairs(spark, e, 0.3)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().toSet
    val allPairs = Similarity.nearDupPairsAllPairs(e, 0.3)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().toSet
    assert(blocked == allPairs)
    assert(blocked.nonEmpty)
  }

  test("bounded top-k aggregate matches the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.table(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id2"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("cos"))
    val viaAgg = Similarity.topK(scored, 5)
      .select("qid", "id2", "cos", "rn").as[(Long, Long, Double, Long)].collect().toSet
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id2"))
    val viaWindow = scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5)
      .select("qid", "id2", "cos", "rn").as[(Long, Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 50)
  }

  test("native nearest-cell argmax matches the composed crossJoin+window form") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.table(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = graft.ops.Ivf.train(e.select(col("vec_id"),
      col("v").cast("array<float>").as("embedding")), 16, 0)
    val native = graft.ops.Ivf.assign(e, cents)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cid", "cvec")
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c").desc, col("cid"))
    val composed = e.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("cid"),
        round(Similarity.cosine(col("v"), col("cvec")), 6).as("c"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(native == composed)
  }

  test("CanonicalizeCosine rule makes argument order canonical") {
    import graft.functions.{CosineSimilarity, toExpression}
    val e = Tables.table(spark, Sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"),
        reverse(col("embedding").cast("array<double>")).as("w"))
    val a = toExpression(e("v")); val b = toExpression(e("w"))
    val plan = e.select(
      graft.functions.toColumn(CosineSimilarity(a, b)).as("x"),
      graft.functions.toColumn(CosineSimilarity(b, a)).as("y"))
      .queryExecution.analyzed
    val rewritten = graft.plans.CanonicalizeCosine(plan)
    val cosines = rewritten.expressions.flatMap(_.collect {
      case c: CosineSimilarity => (c.left.semanticHash(), c.right.semanticHash())
    })
    assert(cosines.size == 2 && cosines.distinct.size == 1,
      s"both cosine calls should be canonicalized to one order: $cosines")
  }

  test("approx_count_distinct within 5% of exact") {
    val e = Tables.events(spark, Sf0001)
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = e.select(approx_count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("annRecall: probing every cell recovers the exact set (recall 1.0)") {
    // with nprobe == numCells the IVF candidate set is the whole corpus
    // minus self, so the probe top-k EQUALS the brute top-k — recall must
    // be exactly 1.0 for every query, with the full-k denominator
    val e = Tables.table(spark, Sf0001, "embeddings")
    val out = graft.ops.Ivf.annRecall(e, e.where(col("vec_id") < 5), 5,
      numCells = 16, nprobe = 16).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("n_brute") == 5L))
    assert(out.forall(_.getAs[Double]("recall") == 1.0))
    // at the bench configuration (nprobe 4/16) recall is a real fraction
    // in (0, 1] and n_hits never exceeds the brute count
    val part = graft.ops.Ivf.annRecall(e, e.where(col("vec_id") < 5), 5,
      numCells = 16, nprobe = 4).collect()
    assert(part.forall(r => r.getAs[Long]("n_hits") <= r.getAs[Long]("n_brute")))
    assert(part.forall(r => r.getAs[Double]("recall") > 0.0))
  }

  test("corpusDiff classifies added/removed/changed/unchanged per source") {
    val prior = Seq(
      (1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"))
      .toDF("doc_id", "source", "text")
    val today = Seq(
      (2L, "s1", "beta"),      // unchanged
      (3L, "s2", "gamma v2"),  // changed
      (4L, "s2", "delta"))     // added; doc 1 (s1) removed
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.corpusDiff(prior, today).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out == Map(
      ("s1", "removed") -> 1L, ("s1", "unchanged") -> 1L,
      ("s2", "changed") -> 1L, ("s2", "added") -> 1L))
  }

  test("corpusDiff on doc_id-bucketed snapshots joins with ZERO shuffle") {
    // the §2 claim made checkable: with both snapshots bucketed by
    // doc_id (the clusterWrite-family layout a 100 TB store maintains),
    // the full-outer content join plans NO exchange — the only shuffle
    // in the whole query is the final sources×4 dim aggregation
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq("diff_prior_bk", "diff_today_bk").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      val d = Tables.table(spark, Sf0001, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      def writeBucketed(df: org.apache.spark.sql.DataFrame, t: String): Unit =
        df.write.bucketBy(8, "doc_id").sortBy("doc_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(t)
      writeBucketed(d.where(col("doc_id") % 2 === 0), "diff_prior_bk")
      writeBucketed(d.where(col("doc_id") % 7 =!= 3), "diff_today_bk")
      val out = TextAnalysis.corpusDiff(
        spark.table("diff_prior_bk"), spark.table("diff_today_bk"))
      out.count() // finalize under AQE
      val plan = out.queryExecution.executedPlan.toString
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges == 1,
        s"expected only the dim-aggregation exchange, got $exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("packing stats count padded vs densely-packed context windows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "s1"), // 5 tokens → 2 windows at ctx=4
      (2L, "x y", "s1"),       // 2 tokens → 1 window
      (3L, "p q r s", "s2"))   // exactly ctx → 1 window, not over
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.packingStats(docs, ctx = 4).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") == 2L && s1.getAs[Long]("total_tokens") == 7L)
    assert(s1.getAs[Long]("n_over_ctx") == 1L)
    assert(s1.getAs[Long]("windows_padded") == 3L) // 2 + 1
    assert(s1.getAs[Long]("windows_packed") == 2L) // ceil(7/4)
    assert(s1.getAs[Double]("padding_waste") == BigDecimal(5.0 / 12.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // (12-7)/12
    assert(out("s2").getAs[Long]("n_over_ctx") == 0L &&
      out("s2").getAs[Double]("padding_waste") == 0.0)
  }

  test("token/quality/fingerprint on a known doc") {
    val d = Seq((1L, "the cat, sat on x2 mats!")).toDF("doc_id", "text")
    val t = TextAnalysis.tokenCount(d).head()
    assert(t.getAs[Long]("n_ws_tokens") == 6L)
    // [the][cat][,][sat][on][x][2][mats][!]
    assert(t.getAs[Long]("n_subword_tokens") == 9L)
    val q = TextAnalysis.qualityScore(d).head()
    assert(q.getAs[Long]("n_words") == 6L)
    assert(q.getAs[Double]("stop_ratio") == 2.0 / 6.0) // the, on
    val f = TextAnalysis.fingerprint(d).head()
    assert(f.getAs[String]("fp").matches("[0-9a-f]{32}"))
  }

  test("ngram frequency, normalization, and pii scrub on known docs") {
    val d = Seq(
      (1L, "a b a b a  b"), // double space collapses in normalize
      (2L, "Mail me at bob.smith@example.com or call 555 123 4567 now"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.ngramFreq(d, 2, 3).collect()
      .map(r => r.getAs[String]("ngram") -> r.getAs[Long]("n")).toMap
    assert(top("a b") == 3L && top("b a") == 2L)
    val norm = TextAnalysis.normalize(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(norm(1L).getAs[Long]("n_chars_norm") == 11L) // "a b a b a b"
    assert(norm(1L).getAs[Long]("n_chars_raw") == 12L)
    val pii = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(pii(2L).getAs[Long]("n_emails") == 1L)
    assert(pii(2L).getAs[Long]("n_digit_runs") == 1L)
    assert(pii(1L).getAs[Long]("n_emails") == 0L)
  }

  test("null and empty texts flow through the text/dedup family without throwing") {
    val d = Seq((1L, "the cat sat on the mat here"), (2L, null), (3L, ""), (4L, "one"))
      .toDF("doc_id", "text")
    // none of these may throw; null/degenerate docs either drop or carry nulls
    assert(Dedup.exact(d).count() == 4) // null and "" are distinct hash groups? both present
    assert(Dedup.minhashLsh(d).count() == 0) // no near-dups among 1 real doc
    assert(Dedup.simhashNearDup(d).count() == 0)
    assert(Dedup.corpusDedup(d).count() == 0)
    val q = TextAnalysis.qualityScore(d).collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(q == Set(1L, 2L, 3L, 4L))
    assert(TextAnalysis.tokenCount(d).count() == 4)
    assert(TextAnalysis.normalize(d).count() == 4)
    assert(TextAnalysis.piiScrub(d).count() == 4)
    assert(TextAnalysis.ngramFreq(d, 2, 10).count() > 0)
    assert(TextAnalysis.curate(d, 0.0).count() >= 2) // null/empty may drop from scoring joins
    assert(graft.ops.Multimodal.meta(d).count() == 4)
    // round-3 ops: degenerate docs drop (no bigrams/terms) or carry nulls
    val ds = d.withColumn("source", lit("web"))
    assert(TextAnalysis.contaminationCheck(ds, "bench").count() == 4)
    assert(TextAnalysis.tfidfTopTerms(d).where(col("doc_id").isin(1L, 4L)).count() > 0)
    assert(TextAnalysis.bigramSurprisal(d).count() == 1) // only doc 1 has bigrams
  }

  test("curate keeps one best-quality doc per normalized-duplicate group") {
    val good = "the cat and of to in is it for on the mats sat here today fine"
    val d = Seq(
      (1L, good),                        // duplicate group (same normalized text)
      (2L, good.replace(" ", "  ")),     //   ... twin with doubled whitespace
      (3L, "zzz qqq www!!!???"))         // low quality: fails the gate
      .toDF("doc_id", "text")
    val out = TextAnalysis.curate(d, 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("norm_fp") == out(2L).getAs[String]("norm_fp"))
    assert(out(1L).getAs[Boolean]("passed_quality") && out(2L).getAs[Boolean]("passed_quality"))
    val keptTwins = Seq(1L, 2L).filter(out(_).getAs[Boolean]("kept"))
    assert(keptTwins.size == 1)
    // the kept twin is the higher-scoring one
    val best = Seq(1L, 2L).maxBy(id => (out(id).getAs[Double]("score"), -id))
    assert(keptTwins.head == best)
    assert(!out(3L).getAs[Boolean]("passed_quality") && !out(3L).getAs[Boolean]("kept"))
  }

  test("lang id prefers marker-bearing languages deterministically") {
    val d = Seq(
      (1L, "the cat and the dog of the house", "en"),
      (2L, "der hund und die katze ist hier", "de"),
      (3L, "zzz qqq www", "en")) // no markers anywhere -> 'en' tie-break
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "en")
  }

  test("contamination check measures benchmark shingle overlap per corpus doc") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon", "bench"), // benchmark doc
      (2L, "alpha beta gamma delta zeta", "web"),      // shares 2 of 3 shingles
      (3L, "one two three four five", "web"),          // shares none
      (4L, "too short", "web"))                        // <3 words -> null
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.contaminationCheck(d, "bench", 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L)) // benchmark docs are not scored
    assert(out(2L).getAs[Long]("n_hit") == 2L &&
      out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_hit") == 0L &&
      !out(3L).getAs[Boolean]("contaminated"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("containment")))
  }

  test("bigram surprisal averages -ln p(w2|w1) under the corpus model") {
    // c12: (a,b)=3, (b,a)=1, (b,x)=1; c1: a=3, b=2
    val d = Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("surprisal"))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, r6(math.log(2.0) / 3))))  // [0, ln2, 0] / 3
    assert(out(2L) == ((2L, r6(math.log(2.0) / 2))))  // [0, ln2] / 2
  }

  test("dsirWeights: hand add-one model; target-like docs upweighted") {
    val d = Seq(
      (1L, "alpha alpha alpha", "en", "s", 1L),
      (2L, "alpha alpha alpha", "de", "s", 1L), // same text, not target
      (3L, "beta beta beta", "de", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.dsirWeights(d, col("lang") === "en").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // hand model (B = 8192): T = 3 target tokens, R = 9 raw;
    // alpha: tc = 3, rc = 6; beta: tc = 0, rc = 3
    def rd12(v: Double) = BigDecimal(v)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val lrA = rd12(math.log(4.0 / (3 + 8192)) - math.log(7.0 / (9 + 8192)))
    val lrB = rd12(math.log(1.0 / (3 + 8192)) - math.log(4.0 / (9 + 8192)))
    assert(r(1L).getAs[Double]("dsir_logratio") == (lrA * 3).toDouble,
      r(1L).toString)
    assert(r(3L).getAs[Double]("dsir_logratio") == (lrB * 3).toDouble,
      r(3L).toString)
    assert(r(1L).getAs[Double]("per_token") == (lrA * 3).toDouble / 3.0)
    // the weight scores the TEXT, not the doc's own flag
    assert(r(1L).getAs[Double]("dsir_logratio") ==
      r(2L).getAs[Double]("dsir_logratio"))
    // target-favored word ranks above the background word (at toy scale
    // the add-one floor B >> counts drags BOTH log-ratios negative; only
    // the ORDER is meaningful — real corpora have tokens >> B)
    assert(r(1L).getAs[Double]("dsir_logratio") >
      r(3L).getAs[Double]("dsir_logratio"))
  }

  test("dsirWeights: sf0.001 — finite, consistent, every doc scored") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val r = TextAnalysis.dsirWeights(docs, col("lang") === "en").cache()
    assert(r.count() == docs.count())
    assert(r.where(isnan(col("dsir_logratio")) ||
      col("dsir_logratio").isNull).count() == 0L)
    val bad = r.where(abs(col("per_token") * col("n_tokens") -
      col("dsir_logratio")) > lit(1e-6)).count()
    assert(bad == 0L)
    r.unpersist()
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val d = Seq(
      (1L, "spark spark spark common"),
      (2L, "duck common"),
      (3L, "goose common"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(d, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        r.getAs[String]("term")).toMap
    // 'common' is in every doc (lowest idf): never rank 1
    assert(out((1L, 1L)) == "spark")
    assert(out((2L, 1L)) == "duck")
    assert(out((3L, 1L)) == "goose")
    assert(out((1L, 2L)) == "common")
  }

  test("lexicalDiversity: hand-built TTR and Guiraud index") {
    val d = Seq((1L, "a b a c"), (2L, "x x x x")).toDF("doc_id", "text")
    val r = TextAnalysis.lexicalDiversity(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_distinct"),
          x.getAs[Double]("ttr"), x.getAs[Double]("guiraud"))).toMap
    assert(r(1L) == ((4L, 3L, 0.75, 1.5)), r.toString)   // 3/sqrt(4) = 1.5
    assert(r(2L) == ((4L, 1L, 0.25, 0.5)), r.toString)
  }

  test("tokenizerFertility: hand-built per-lang token ratios") {
    // en: "a bb" -> 2 words, 2 subwords (fertility 1); "x1y" -> 1 word,
    // 3 subwords ([x][1][y]); lang totals: w 3, s 5
    val d = Seq((1L, "a bb", "en", 4L), (2L, "x1y", "en", 3L), (3L, "zz", "fr", 2L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.tokenizerFertility(d).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("ws_tokens"), x.getAs[Long]("subword_tokens"),
          x.getAs[Double]("fertility"), x.getAs[Double]("chars_per_token"))).toMap
    assert(r("en") == ((3L, 5L, 1.666667, 1.4)), r.toString)
    assert(r("fr") == ((1L, 1L, 1.0, 2.0)), r.toString)
  }

  test("ltvCohorts: hand-built cumulative revenue per cohort and user") {
    // two users, both first active on day 0 (one cohort of 2): purchases
    // 10 on day 0; 20 + 30 on day 1 -> revenue (10, 50), cum (10, 60),
    // ltv per user (5, 30); a click-only day creates no revenue row
    val day = 86400L
    val ev = Seq(
      (1L, 0L, 10L, "purchase", 10.0), (2L, 0L, 20L, "click", 0.0),
      (3L, day, 10L, "purchase", 20.0), (4L, day, 20L, "purchase", 30.0),
      (5L, 2 * day, 10L, "click", 0.0))
      .map { case (e, off, u, t, v) => (e, ts(T0 + off), u, t, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.ops.Events.ltvCohorts(ev).collect()
      .map(x => x.getAs[Long]("age_days") ->
        (x.getAs[Long]("n_users"), x.getAs[Double]("revenue"),
          x.getAs[Double]("cum_revenue"), x.getAs[Double]("ltv_per_user"))).toMap
    assert(r.size == 2, r.toString)
    assert(r(0L) == ((2L, 10.0, 10.0, 5.0)), r.toString)
    assert(r(1L) == ((2L, 50.0, 60.0, 30.0)), r.toString)
  }

  test("centroidDrift: a duplicated-snapshot corpus pins drift 1, churn 0") {
    // every odd vec_id duplicates its even twin: the refinement step sees
    // each cell's membership exactly doubled with identical means, so the
    // centroids do not move and no prior vector changes cell
    val emb = (0 until 40).map { i =>
      val base = i / 2 * 2 // twin pairs (0,1), (2,3), ...
      (i.toLong, Seq(1.0f + base * 0.13f, 2.0f - base * 0.07f,
        0.5f + (base % 7) * 0.31f, 1.0f + (base % 5) * 0.19f))
    }.toDF("vec_id", "embedding")
    val r = graft.ops.Ivf.centroidDrift(emb).collect()
    assert(r.nonEmpty && r.length <= 16, r.length.toString)
    r.foreach { row =>
      assert(row.getAs[Double]("drift_cos") == 1.0, row.toString)
      assert(row.getAs[Long]("n_moved") == 0L, row.toString)
      assert(row.getAs[Double]("churn_rate") == 0.0, row.toString)
      assert(row.getAs[Long]("n_members") > 0L, row.toString)
    }
  }

  test("datasetCard: constructed two-source card (dups, mix, percentiles)") {
    // source A: 4 docs (one exact dup pair), en x3 / fr x1, chars 10..40
    // source B: 1 doc, single lang -> entropy pinned to literal 0
    val d = Seq(
      (1L, "dup dup", "en", "A", 10L), (2L, "dup dup", "en", "A", 20L),
      (3L, "uniq one", "en", "A", 30L), (4L, "uniq two", "fr", "A", 40L),
      (5L, "solo", "en", "B", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.datasetCard(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val a = r("A")
    assert(a.getAs[Long]("n_docs") == 4L && a.getAs[Long]("total_chars") == 100L)
    assert(a.getAs[Double]("mean_chars") == 25.0)
    assert(a.getAs[Long]("p50_chars") == 25L, a.toString)
    assert(a.getAs[Long]("p95_chars") == 39L, a.toString) // 30 + 0.85*10 = 38.5 -> 39
    assert(a.getAs[Long]("n_langs") == 2L && a.getAs[String]("top_lang") == "en")
    assert(a.getAs[Double]("dup_rate") == 0.25, a.toString)
    // -0.75 ln 0.75 -> 0.215762; -0.25 ln 0.25 -> 0.346574 (each rounded 6)
    assert(a.getAs[Double]("lang_entropy") == 0.562336, a.toString)
    val b = r("B")
    assert(b.getAs[Double]("lang_entropy") == 0.0 && b.getAs[Double]("dup_rate") == 0.0)
  }
}

class MultimodalSpec extends SparkSpec {
  test("binary payload plumbing: schema, determinism, batch shape") {
    val d = Tables.table(spark, Sf0001, "documents")
    val meta = Multimodal.meta(d)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "n_bytes", "content_md5", "payload_hex_prefix", "modality"))
    val dec = Multimodal.decodeStub(d)
    assert(dec.columns.toSeq == Seq("doc_id", "width", "height", "channels",
      "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"))
    val rows = dec.collect()
    assert(rows.length == d.count().toInt)
    assert(rows.forall { r =>
      (0 until 8).forall { i =>
        val f = r.getAs[Double](s"f$i"); f >= 0.0 && f <= 1.0
      }
    })
    assert(rows.forall { r =>
      val w = r.getAs[Long]("width"); w >= 16 && w < 80
    })
    // deterministic across runs/partitioning
    val again = Multimodal.decodeStub(d.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("width")).toMap
    assert(rows.forall(r => again(r.getAs[Long]("doc_id")) == r.getAs[Long]("width")))
  }

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real image decode: javax.imageio round-trips generated PNGs exactly") {
    val red = png(8, 4)((_, _) => 0xFF0000)
    // checkerboard: half white half blue → exact rational channel means
    val check = png(2, 2)((x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0x0000FF)
    val jpg = { // decoded-but-lossy: only shape/ok asserted
      val img = new java.awt.image.BufferedImage(
        5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    // > 64 rows so the decode crosses its 64-row batch boundary
    val fill = (10L until 80L).map(i => (i, png(3, 3)((_, _) => 0x808080)))
    val rows = ((1L, red) +: (2L, check) +: (3L, jpg) +:
      (4L, "not an image".getBytes("UTF-8")) +: fill)
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val got = Multimodal.decodeImage(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == rows.length)
    val r1 = got(1L)
    assert(r1.getBoolean(1) && r1.getLong(2) == 8 && r1.getLong(3) == 4 &&
      r1.getLong(4) == 3)
    assert(r1.getDouble(5) == 1.0 && r1.getDouble(6) == 0.0 &&
      r1.getDouble(7) == 0.0)
    val r2 = got(2L)
    assert(r2.getLong(2) == 2 && r2.getLong(3) == 2)
    assert(r2.getDouble(5) == 0.5 && r2.getDouble(6) == 0.5 &&
      r2.getDouble(7) == 1.0)
    val r3 = got(3L)
    assert(r3.getBoolean(1) && r3.getLong(2) == 5 && r3.getLong(3) == 3)
    // junk bytes: ok=false with null metrics, never a job failure
    val r4 = got(4L)
    assert(!r4.getBoolean(1) && r4.isNullAt(2) && r4.isNullAt(5))
    fill.foreach { case (i, _) =>
      assert(got(i).getBoolean(1) && got(i).getLong(2) == 3)
    }
    // partitioning-invariant (decode is pure per-row work)
    val again = Multimodal.decodeImage(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(got.keySet.forall(k => again(k) == got(k).toSeq))
  }

  test("imagePhash: DCT hash clusters small rotation/crop/brightness " +
    "variants of a real PNG; unrelated content lands far; junk is ok=false") {
    import java.awt.image.BufferedImage
    // low-frequency structure (gradient + disc) OVER a 24 px checkerboard
    // texture: the texture dominates adjacent-block gradient signs (the
    // dHash bits) but sits ABOVE the DCT low-frequency cutoff — real
    // images have texture, and alignment changes scramble it
    def scene(phase: Int)(x: Int, y: Int): Int = {
      val cx = 100 + phase * 56; val cy = 120 + phase * 40
      val g = math.min(195, (x + y) / 2)
      val t = if (((x / 12) + (y / 12)) % 2 == 0) 30 else -30
      val v0 = if ((x - cx) * (x - cx) + (y - cy) * (y - cy) < 3600) 225
               else g + t
      val v = math.max(0, math.min(255, v0))
      (v << 16) | (v << 8) | v
    }
    def buf(rgb: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 256; x <- 0 until 256) img.setRGB(x, y, rgb(x, y))
      img
    }
    def enc(img: BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val base = buf(scene(0))
    def rotated(deg: Double): Array[Byte] = {
      val dst = new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      g2.setColor(new java.awt.Color(128, 128, 128)); g2.fillRect(0, 0, 256, 256)
      g2.rotate(math.toRadians(deg), 128, 128)
      g2.drawImage(base, 0, 0, null); g2.dispose()
      enc(dst)
    }
    val cropped = enc(base.getSubimage(12, 12, 232, 232))
    val brightened = enc(buf((x, y) => {
      val v = math.min(255, (scene(0)(x, y) & 0xFF) + 25)
      (v << 16) | (v << 8) | v
    }))
    val rows = Seq(
      (1L, enc(base)), (2L, rotated(2.5)), (3L, cropped), (4L, brightened),
      (5L, enc(buf(scene(1)))),                      // unrelated scene
      (6L, "not an image".getBytes("UTF-8")))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val got = Multimodal.imagePhash(df).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) Some(r.getLong(2)) else None))
      .toMap
    assert(got(6L).isEmpty, "junk bytes: ok=false, null hash, no crash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h1 = got(1L).get
    assert(h1 > 0L && h1 < Long.MaxValue, "hash lives in [0, 2^63)")
    for ((id, label) <- Seq(2L -> "2.5° rotation", 3L -> "10% crop",
      4L -> "brightness shift")) {
      assert(ham(h1, got(id).get) <= 12,
        s"$label must stay within a quarter-hash of the base " +
          s"(got ${ham(h1, got(id).get)})")
    }
    assert(ham(h1, got(5L).get) >= 20,
      s"unrelated content must land far (got ${ham(h1, got(5L).get)})")
    // measured honestly: on these synthetic scenes BOTH faces stay close
    // under the small transforms (dHash's coarse pooling is itself quite
    // stable); the DCT face's contract here is the ABSOLUTE robustness
    // bound above plus landing in the same [0, 2^63) space — it extends
    // coverage (global structure vs local gradients) rather than
    // dominating dHash on every transform
    // partitioning-invariant (pure per-row decode + fixed-order DCT)
    val again = Multimodal.imagePhash(df.repartition(5)).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) Some(r.getLong(2)) else None))
      .toMap
    assert(again == got)
  }

  private def wav(rate: Float, nFrames: Int)(sample: Int => Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val s = sample(i)
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real audio decode: javax.sound round-trips generated WAVs exactly") {
    // constant full-scale-half signal: RMS exactly 0.5
    val const = wav(8000f, 800)(_ => 16384)
    // alternating +/-: same RMS, exercises the signed little-endian path
    val alt = wav(44100f, 4410)(i => if (i % 2 == 0) 16384 else -16384)
    val silent = wav(16000f, 160)(_ => 0)
    // > 64 rows to cross the decode batch boundary
    val fill = (10L until 80L).map(i => (i, wav(8000f, 80)(_ => 16384)))
    val rows = ((1L, const) +: (2L, alt) +: (3L, silent) +:
      (4L, "not audio at all".getBytes("UTF-8")) +: fill)
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val got = Multimodal.decodeAudio(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == rows.length)
    val r1 = got(1L)
    assert(r1.getBoolean(1) && r1.getDouble(2) == 8000.0 &&
      r1.getLong(3) == 1 && r1.getLong(4) == 800)
    assert(r1.getDouble(5) == 100.0) // 800 frames at 8 kHz = 100 ms
    assert(r1.getDouble(6) == 0.5)   // 16384/32768 exactly
    val r2 = got(2L)
    assert(r2.getDouble(2) == 44100.0 && r2.getLong(4) == 4410 &&
      r2.getDouble(6) == 0.5)
    assert(got(3L).getBoolean(1) && got(3L).getDouble(6) == 0.0)
    // junk bytes: ok=false with null metrics, never a job failure
    val r4 = got(4L)
    assert(!r4.getBoolean(1) && r4.isNullAt(2) && r4.isNullAt(6))
    fill.foreach { case (i, _) => assert(got(i).getBoolean(1)) }
    // partitioning-invariant (decode is pure per-row work)
    val again = Multimodal.decodeAudio(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(got.keySet.forall(k => again(k) == got(k).toSeq))
  }

  test("audio RMS: chunked accumulation is bit-identical on a multi-buffer clip") {
    // 1.5M frames = 3 MB of PCM ≈ 46 reads of the 64 KB buffer — the
    // varying signal makes any dropped/duplicated/reordered sample move
    // the double accumulation, so == pins the chunked loop bit-for-bit
    val n = 1500000
    def sig(i: Int): Short = ((i * 2654435761L % 65536) - 32768).toShort
    val big = wav(44100f, n)(sig)
    assert(big.length > (1 << 21), "clip must span many 64 KB reads")
    val got = Multimodal.decodeAudio(
      spark.createDataFrame(Seq((1L, big))).toDF("doc_id", "payload"))
      .collect().head
    assert(got.getBoolean(1) && got.getLong(4) == n.toLong)
    // reference: the same left-to-right Σx² over the raw samples
    var acc = 0.0
    (0 until n).foreach { i => val x = sig(i) / 32768.0; acc += x * x }
    assert(got.getDouble(6) == math.sqrt(acc / n),
      "chunked RMS must equal the whole-array pass exactly")
  }

  // ---- perceptual dHash: real-codec face (r11) ----

  private def grayPng(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, v(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("imageDhash: gradient signs, brightness invariance, junk fallback") {
    // horizontal gradient: every right block-neighbor is strictly
    // brighter -> all 63 bits set
    val base = grayPng(36, 16)((x, _) => x * 7)
    // +8 brightness (no clamping at these values): gradient signs
    // unchanged -> different bytes, IDENTICAL dHash
    val bright = grayPng(36, 16)((x, _) => x * 7 + 8)
    // flatten the top-right block pair in block-row 0 only (pixel rows
    // 0-1): exactly ONE comparison flips -> Hamming 1
    val nudged = grayPng(36, 16)((x, y) =>
      if (y < 2 && x >= 28) 28 * 7 else x * 7)
    val inverted = grayPng(36, 16)((x, _) => (35 - x) * 7)
    val junk = "not an image".getBytes("UTF-8")
    val df = spark.createDataFrame(Seq(
      (1L, base), (2L, bright), (3L, nudged), (4L, inverted), (5L, junk)))
      .toDF("doc_id", "payload")
    val got = Multimodal.imageDhash(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val all63 = (1L << 63) - 1 // bits 0..62
    assert(got(1L).getBoolean(1) && got(1L).getLong(2) == all63)
    assert(got(2L).getLong(2) == got(1L).getLong(2),
      "brightness shift must not move the dHash")
    assert(java.lang.Long.bitCount(got(3L).getLong(2) ^ all63) == 1,
      "one flattened block pair = Hamming 1")
    assert(got(4L).getLong(2) == 0L, "inverted gradient clears every bit")
    assert(!got(5L).getBoolean(1) && got(5L).isNullAt(2),
      "junk bytes: ok=false, null hash")
    // partitioning-invariant
    val again = Multimodal.imageDhash(df.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(got.keySet.forall(k => again(k) == got(k).toSeq))
  }

  test("audioFingerprint: envelope signs, volume invariance, junk/format fallback") {
    import graft.ops.Dedup
    // 64 envelope frames x 100 samples; frame f carries amplitude
    // 1000 + 400f (all even, so exact halving below) -> strictly
    // increasing energy -> all 63 bits set
    def ramp(scale: Int): Array[Byte] = wav(8000f, 6400) { i =>
      val a = (1000 + 400 * (i / 100)) / scale
      (if (i % 2 == 0) a else -a).toShort
    }
    def rev: Array[Byte] = wav(8000f, 6400) { i =>
      val a = 1000 + 400 * (63 - i / 100)
      (if (i % 2 == 0) a else -a).toShort
    }
    val df = spark.createDataFrame(Seq(
      (1L, ramp(1)), (2L, ramp(2)), (3L, rev),
      (4L, "not audio".getBytes("UTF-8"))))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioFingerprint(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val all63 = (1L << 63) - 1
    assert(got(1L).getBoolean(1) && got(1L).getLong(2) == all63)
    // half volume: every frame's energy scales by 1/4 exactly -> the
    // energy-RATIO signs (and so the fingerprint) are unchanged
    assert(got(2L).getLong(2) == all63, "gain must not move the fingerprint")
    assert(got(3L).getLong(2) == 0L, "reversed envelope clears every bit")
    assert(!got(4L).getBoolean(1) && got(4L).isNullAt(2))
    // the same dedup machinery clusters the gain-shifted near-dup
    val out = Dedup.dhashDedup(Multimodal.audioFingerprint(df)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)))
    assert(out(3L) == ((3L, true)) && out(4L) == ((4L, true)))
    // partitioning-invariant
    val again = Multimodal.audioFingerprint(df.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(got.keySet.forall(k => again(k) == got(k).toSeq))
  }

  test("frameDhash + videoFramesDedup: real PNG frame sequences, majority rule, junk frame") {
    import graft.ops.Dedup
    // luma constant per 4-px column block (aligned with the 8x9 pool), so
    // a frame's dhash is its 8-step sign pattern replicated per row:
    // different patterns sit >= 7 bits apart, +8 brightness moves nothing
    def pat(s: Seq[Int], shift: Int): Array[Byte] =
      grayPng(36, 16)((x, _) => s(x / 4) * 25 + shift)
    val asc = Seq(0, 1, 2, 3, 4, 5, 6, 7, 8)
    val alt = Seq(0, 9, 0, 9, 0, 9, 0, 9, 0)
    val blocks = Seq(0, 9, 9, 0, 0, 9, 9, 0, 0)
    val altInv = Seq(9, 0, 9, 0, 9, 0, 9, 0, 9)
    val blocksInv = Seq(9, 0, 0, 9, 9, 0, 0, 9, 9)
    val junk = "not a png".getBytes("UTF-8")
    val frames = spark.createDataFrame(Seq(
      (1L, 0L, pat(asc, 0)), (1L, 1L, pat(alt, 0)), (1L, 2L, pat(blocks, 0)),
      // clip 1 re-encoded +8 brighter: every frame Hamming 0 -> 3/3
      (2L, 0L, pat(asc, 8)), (2L, 1L, pat(alt, 8)), (2L, 2L, pat(blocks, 8)),
      // shares ONLY frame 0 -> 1/3, stays apart
      (3L, 0L, pat(asc, 0)), (3L, 1L, pat(altInv, 0)), (3L, 2L, pat(blocksInv, 0)),
      // junk middle frame: frames 0 and 2 still match clip 1 -> 2/3
      (4L, 0L, pat(asc, 8)), (4L, 1L, junk), (4L, 2L, pat(blocks, 0))))
      .toDF("doc_id", "frame_idx", "payload")
    val hashed = Multimodal.frameDhash(frames)
    val byKey = hashed.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(!byKey((4L, 1L)).getBoolean(2) && byKey((4L, 1L)).isNullAt(3),
      "junk frame comes back ok=false with a null hash")
    assert(byKey.values.count(_.getBoolean(2)) == 11)
    val out = Dedup.videoFramesDedup(
      hashed.withColumn("n_frames", lit(3L))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("dhash")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)) &&
      out(4L) == ((1L, false)), s"brightness/junk variants must cluster: $out")
    assert(out(3L) == ((3L, true)), "sub-majority frame overlap stays apart")
    // decode is partitioning-invariant
    val again = Multimodal.frameDhash(frames.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq).toMap
    assert(byKey.keySet.forall(k => again(k) == byKey(k).toSeq))
  }

  test("dhashDedup over real images: near-dups cluster, inversions and junk stay singletons") {
    import graft.ops.Dedup
    val base = grayPng(36, 16)((x, _) => x * 7)
    val bright = grayPng(36, 16)((x, _) => x * 7 + 8)
    val nudged = grayPng(36, 16)((x, y) =>
      if (y < 2 && x >= 28) 28 * 7 else x * 7)
    val inverted = grayPng(36, 16)((x, _) => (35 - x) * 7)
    val junk = "junk bytes".getBytes("UTF-8")
    val df = spark.createDataFrame(Seq(
      (1L, base), (2L, bright), (3L, nudged), (4L, inverted), (5L, junk)))
      .toDF("doc_id", "payload")
    val out = Dedup.dhashDedup(Multimodal.imageDhash(df)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size == 5, "every input row must come back")
    // 1, 2 (Hamming 0) and 3 (Hamming 1) share a cluster; min id keeps
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false)) &&
      out(3L) == ((1L, false)))
    // the inversion and the failed decode are their own singletons
    assert(out(4L) == ((4L, true)) && out(5L) == ((5L, true)))
  }

}

class LogRegSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.LogReg

  /** Driver-local reference replica of the training semantics: same
    * hashing, normalization, quantization, and update rule — gradient
    * sums are exact Longs in both, so the distributed fit must match
    * BITWISE, not approximately. */
  private def localTrain(docs: Seq[(Long, Boolean, String)], d: Int,
                         epochs: Int, lr: Double, l2: Double)
      : (Array[Double], Double, Seq[Double]) = {
    val feats = docs.map { case (_, y, text) =>
      (y, text.split("\\s+").filter(_.nonEmpty)
        .map(t => LogReg.hashBucketLocal(t, d)).distinct.sorted.toSeq)
    }.filter(_._2.nonEmpty)
    val w = new Array[Double](d + 1)
    val v = new Array[Double](d + 1)
    val curve = Seq.newBuilder[Double]
    for (_ <- 0 until epochs) {
      val grad = new Array[Long](d + 2)
      var n = 0L
      var maxK = 1L
      feats.foreach { case (y, bs) =>
        var z = w(d)
        bs.foreach(b => z += w(b))
        val p = 1.0 / (1.0 + math.exp(-z))
        val g = p - (if (y) 1.0 else 0.0)
        val gq = math.round(g * 1e6)
        bs.foreach(b => grad(b) += gq)
        grad(d) += gq
        val eps = 1e-12
        grad(d + 1) += math.round((if (y) -math.log(math.max(p, eps))
          else -math.log(math.max(1.0 - p, eps))) * 1e6)
        n += 1
        maxK = math.max(maxK, bs.length.toLong)
      }
      val nn = math.max(n, 1L).toDouble
      val step = lr / (0.25 * maxK)
      for (b <- 0 until d) {
        v(b) = 0.9 * v(b) + (grad(b) / 1e6 / nn + l2 * w(b))
        w(b) -= step * v(b)
      }
      v(d) = 0.9 * v(d) + grad(d) / 1e6 / nn
      w(d) -= step * v(d)
      curve += grad(d + 1) / 1e6 / nn
    }
    (w.take(d), w(d), curve.result())
  }

  private def corpus(n: Int): Seq[(Long, Boolean, String)] =
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val filler = s"shared tok${i % 5} common words here"
      (i.toLong, pos, if (pos) s"alpha marker $filler" else s"omega marker $filler")
    }

  test("distributed fit matches the driver-local reference BITWISE") {
    val docs = corpus(24)
    val df = docs.map { case (id, y, t) => (id, y, t) }.toDF("doc_id", "y", "text")
    val m = LogReg.train(df, col("y"), d = 32, epochs = 3, lr = 1.0, l2 = 1e-4)
    val (lw, lb, lc) = localTrain(docs, d = 32, epochs = 3, lr = 1.0, l2 = 1e-4)
    assert(m.weights.toSeq == lw.toSeq, "weights must match exactly")
    assert(m.bias == lb && m.lossCurve == lc)
  }

  test("training is bit-reproducible across partitionings") {
    val df = corpus(30).toDF("doc_id", "y", "text")
    val m2 = LogReg.train(df.repartition(2), col("y"), d = 64, epochs = 4)
    val m7 = LogReg.train(df.repartition(7), col("y"), d = 64, epochs = 4)
    assert(m2.weights.toSeq == m7.weights.toSeq && m2.bias == m7.bias &&
      m2.lossCurve == m7.lossCurve)
  }

  test("separable corpus: loss falls, scoring predicts every label") {
    val df = corpus(40).toDF("doc_id", "y", "text")
    val m = LogReg.train(df, col("y"), d = 128, epochs = 25)
    assert(m.lossCurve.last < m.lossCurve.head / 2,
      s"loss must fall: ${m.lossCurve.head} -> ${m.lossCurve.last}")
    val scored = LogReg.score(df, m).join(df.select(col("doc_id"), col("y")), "doc_id")
    assert(scored.where(col("pred") =!= col("y")).count() == 0L)
    // zero-token doc scores at sigma(bias), never NaN
    val empty = LogReg.score(Seq((99L, "  ")).toDF("doc_id", "text"), m)
      .head().getDouble(1)
    assert(empty == 1.0 / (1.0 + math.exp(-m.bias)))
  }

  test("real corpus: a content label is learnable from a balanced seed set") {
    // the pipeline shape: label a BALANCED seed set (the fasttext/CCNet
    // recipe — class priors washed out so the witness token, not the
    // prior, carries the decision), fit, then score
    // witness token 'window' — hash-collision-free at d = 256 over this
    // corpus's vocabulary ('join', the first pick, lands in the same
    // md5 bucket as 'the' at any d dividing 2^10, capping accuracy at
    // the collided optimum — a measured reminder that hashed-feature
    // ceilings are collision facts, not optimizer failures)
    val docs = graft.core.Tables.table(spark, Sf0001, "documents")
    val label = col("text").contains("window")
    val seed = docs.where(label).orderBy("doc_id").limit(90)
      .unionByName(docs.where(!label).orderBy("doc_id").limit(90))
    val m = LogReg.train(seed, label, d = 256, epochs = 30)
    assert(m.lossCurve.last < m.lossCurve.head / 2)
    val scored = LogReg.score(seed, m)
      .join(seed.select(col("doc_id"), label.as("y")), "doc_id")
    val n = scored.count().toDouble
    assert(n == 180.0)
    val acc = scored.where(col("pred") === col("y")).count() / n
    assert(acc > 0.9, s"acc $acc must clear the 0.5 balanced baseline decisively")
  }

  test("score is map-only: no exchange, no UDF in the serving plan") {
    val m = LogReg.Model(8, Array.fill(8)(0.1), 0.0, Nil)
    val plan = LogReg.score(Seq((1L, "a b")).toDF("doc_id", "text"), m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
