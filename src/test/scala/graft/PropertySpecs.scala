package graft

import graft.core.Timeframe
import graft.ohlcv.Candles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based checks of the algebraic claims the engine is built on:
  * mergeable candles form a commutative monoid under `Candles.merge`
  * (so ANY partitioning / batch arrival order yields the same store), and
  * the salted resample is output-identical to the plain one. Cases are
  * generated with seeded scalacheck Gens — deterministic, but far wider
  * than hand-picked examples.
  */
class CandleAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private case class Trade(symbol: String, off: Int, price: Double, qty: Double)

  // unique trade timestamps by construction (the documented determinism
  // precondition for open/close picks)
  private val genTrades: Gen[List[Trade]] = for {
    n <- Gen.chooseNum(5, 60)
    offs <- Gen.pick(n, 0 until 3000)
    syms <- Gen.listOfN(n, Gen.oneOf("BTC", "ETH", "XRP"))
    prices <- Gen.listOfN(n, Gen.chooseNum(1, 99999))
    qtys <- Gen.listOfN(n, Gen.chooseNum(1, 9999))
  } yield offs.toList.lazyZip(syms).lazyZip(prices).lazyZip(qtys).map {
    case (o, s, p, q) => Trade(s, o, p / 100.0, q / 100.0)
  }

  private def df(trades: Seq[Trade]): DataFrame =
    trades.map(t => (t.symbol, ts(T0 + t.off), t.price, t.qty))
      .toDF("symbol", "ts", "price", "qty")

  private def canon(c: DataFrame): Set[Seq[Any]] =
    c.select("symbol", "bucket_ts", "open", "high", "low", "close", "volume", "trades")
      .collect().map(_.toSeq).toSet

  private def cases(n: Int): Seq[List[Trade]] =
    (0 until n).flatMap(i =>
      genTrades.apply(Gen.Parameters.default, rng.Seed(i.toLong)))

  test("merge(split A, split B) == fromTrades(A ++ B) for random splits") {
    val tf = Timeframe.parse("5m")
    cases(5).zipWithIndex.foreach { case (trades, i) =>
      val (a, b) = trades.splitAt(trades.length * (i % 3 + 1) / 4)
      val whole = Candles.fromTradesMergeable(df(trades), tf)
      val merged = Candles.merge(
        Candles.fromTradesMergeable(df(a), tf),
        Candles.fromTradesMergeable(df(b), tf))
      assert(canon(merged) == canon(whole), s"case $i: split merge diverged")
    }
  }

  test("fromTrades candles always pass the consistency validator") {
    // structural invariant: resampled candles can never violate the OHLC
    // envelope, leave the timeframe grid, or carry non-positive volume —
    // for ANY generated trade set
    val tf = Timeframe.parse("5m")
    cases(6).zipWithIndex.foreach { case (trades, i) =>
      val v = graft.ohlcv.Analytics.validate(
        Candles.fromTrades(df(trades), tf), tf.micros).collect()
      v.foreach { r =>
        assert(r.getAs[Long]("n_ohlc_violations") == 0L, s"case $i: envelope")
        assert(r.getAs[Long]("n_off_grid") == 0L, s"case $i: grid")
        assert(r.getAs[Long]("n_nonpos_volume") == 0L, s"case $i: volume")
      }
    }
  }

  test("substring dedup stats are partitioning-invariant and internally consistent") {
    // clean_fp/dup_ratio must be pure functions of the corpus CONTENT:
    // shuffling doc order / changing partitioning cannot move a hash
    val docs = (0 until 40).map(i =>
      (i.toLong, if (i % 4 == 0) "shared boiler plate span here " + ("x y z " * (i % 3 + 1))
      else s"unique text number $i with several more words attached " + i))
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.substringDedup(d, window = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getAs[Double]("dup_ratio"), r.getAs[String]("clean_fp"))).toSet
    val base = run(docs.toDF("doc_id", "text"))
    assert(base == run(scala.util.Random.shuffle(docs).toDF("doc_id", "text")
      .repartition(7)))
    // n_repeated_spans never exceeds n_spans; ratio consistent
    base.foreach { case (_, nSpans, nRep, ratio, _) =>
      assert(nRep <= nSpans && math.abs(ratio - nRep.toDouble / nSpans) < 1e-6)
    }
  }

  test("merge is commutative and the empty set is an identity") {
    val tf = Timeframe.parse("5m")
    val Seq(t1, t2raw) = cases(2)
    // merge's precondition: the two batches' trade timestamps are disjoint
    val t2 = t2raw.map(t => t.copy(off = t.off + 3000))
    val m1 = Candles.fromTradesMergeable(df(t1), tf)
    val m2 = Candles.fromTradesMergeable(df(t2), tf)
    assert(canon(Candles.merge(m1, m2)) == canon(Candles.merge(m2, m1)))
    val empty = Candles.fromTradesMergeable(df(Nil), tf)
    assert(canon(Candles.merge(m1, empty)) == canon(m1))
  }

  test("salted resample is output-identical to the plain one on random data") {
    val tf = Timeframe.parse("1m")
    cases(3).foreach { trades =>
      val plain = canon(Candles.fromTrades(df(trades), tf))
      val salted = canon(Candles.fromTradesSalted(df(trades), tf))
      assert(salted == plain)
    }
  }

  test("timeframe grammar roundtrips and rejects junk") {
    Seq("1m", "5m", "15m", "1h", "4h", "1d", "1w", "30s", "1M", "1y").foreach { s =>
      assert(Timeframe.parse(s).toString == s)
    }
    Seq("", "m", "5x", "-1m", "1.5h", "h1").foreach { s =>
      intercept[IllegalArgumentException](Timeframe.parse(s))
    }
  }
}

/** Property-based checks of the SQLite writer: random rows of every
  * serial-type class round-trip byte-exactly through write + the
  * independent test reader, across single-leaf and multi-level trees.
  */
class SqliteAlgebraSpec extends SparkSpec {
  import graft.sinks.SqliteFile._

  private val genValue: Gen[SqlValue] = Gen.oneOf(
    Gen.const(SqlNull),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(SqlInt),
    Gen.chooseNum(-1e12, 1e12).map(SqlReal),
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(cs => SqlText(cs.mkString))))

  private val genRows: Gen[List[(Long, Seq[SqlValue])]] = for {
    n <- Gen.oneOf(0, 1, 3, 400, 3000) // empty, single-leaf and interior trees
    ids <- Gen.pick(n, 0 until 100000)
    rows <- Gen.listOfN(n, Gen.listOfN(3, genValue))
  } yield ids.toList.sorted.map(_.toLong).lazyZip(rows)
    .map((id, vs) => (id, SqlNull +: vs.toSeq)).toList

  test("random rows round-trip through write + independent reader") {
    val dir = java.nio.file.Files.createTempDirectory("sqlite-prop").toFile
    (0 until 8).foreach { i =>
      val rows = genRows.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).get
      val f = new java.io.File(dir, s"p$i.sqlite")
      val sql = "CREATE TABLE t (id INTEGER PRIMARY KEY, a, b, c)"
      assert(graft.sinks.SqliteFile.write(f, "t", sql, rows.iterator) == rows.length.toLong)
      val (_, gotSql, got) = SqliteReaderForTest.read(f)
      assert(gotSql == sql)
      val expected = rows.map { case (id, vs) =>
        (id, vs.map {
          case SqlNull => null
          case SqlInt(v) => v
          case SqlReal(v) => v
          case SqlText(v) => v
        })
      }
      assert(got == expected, s"case $i diverged")
    }
  }
}

/** Differential oracle for the LSH banding + skew-cap pipeline: for random
  * corpora (duplicate clusters, near-dup variants, noise, shuffled ids)
  * the ENTIRE minhashLsh candidate output — pair set AND estimated
  * jaccards — must equal an independent plain-Scala replay of the
  * contract from the collected signatures: 60-bit md5 band buckets,
  * all-pairs below `maxBucket`, hash-sampled numReps representatives +
  * stride-1/2 rings above it. The fixed-construction adversarial floors
  * live in LshRecallSpecs; this sweeps the formula across random shapes.
  */
class LshAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def expected(sigs: Map[Long, Seq[Long]], maxBucket: Int,
                       numReps: Int): Map[(Long, Long), Double] = {
    val pairs = scala.collection.mutable.Set[(Long, Long)]()
    (0 until 16).foreach { b =>
      sigs.toSeq
        .groupBy { case (_, sig) => h60(sig.slice(b * 8, b * 8 + 8).mkString(",")) }
        .values.foreach { bucket =>
          val ids = bucket.map(_._1).sorted
          if (ids.size <= maxBucket)
            for (i <- ids.indices; j <- i + 1 until ids.size)
              pairs += ((ids(i), ids(j)))
          else {
            val reps = ids.sortBy(id =>
              (graft.streaming.StreamingNearDup.h32(id), id)).take(numReps)
            for (id <- ids; r <- reps; if id != r)
              pairs += ((math.min(id, r), math.max(id, r)))
            for (i <- 0 until ids.size - 1) pairs += ((ids(i), ids(i + 1)))
            for (i <- 0 until ids.size - 2) pairs += ((ids(i), ids(i + 2)))
          }
        }
    }
    pairs.map { case (a, b) =>
      val (s1, s2) = (sigs(a), sigs(b))
      (a, b) -> s1.indices.count(i => s1(i) == s2(i)) / 128.0
    }.toMap
  }

  test("minhashLsh == plain-Scala banding/cap replay on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def text(): String =
        Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = scala.collection.mutable.ArrayBuffer[String]()
      (0 until 2 + rnd.nextInt(3)).foreach { _ =>  // duplicate clusters
        val t = text()
        (0 until 2 + rnd.nextInt(10)).foreach(_ => docs += t)
        docs += (t + " " + vocab(rnd.nextInt(vocab.size)))  // near-dup tail
      }
      (0 until 5 + rnd.nextInt(5)).foreach(_ => docs += text())  // noise
      val ids = rnd.shuffle(docs.indices.map(_.toLong + 1).toVector)
      val df = ids.zip(docs).toDF("doc_id", "text")
      val maxBucket = 4
      val sigs = graft.ops.Dedup.minhashSignatures(df)
        .select(col("doc_id"), col("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      val exp = expected(sigs, maxBucket, numReps = 8)
      val got = graft.ops.Dedup.minhashLsh(df, maxBucket = maxBucket)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, e) => (a, b) -> e }.toMap
      graft.core.Materialize.releaseAll(spark, blocking = true)
      assert(got == exp,
        s"seed $seed: ${got.keySet.diff(exp.keySet).take(3)} unexpected, " +
          s"${exp.keySet.diff(got.keySet).take(3)} missing of ${exp.size}")
      assert(exp.nonEmpty && exp.values.exists(_ == 1.0), s"seed $seed too weak")
    }
  }
}

/** Same differential treatment for incrementalDedup's hash-sampled
  * corpus-bucket screen: the batch rollup (candidate counts, best match,
  * best estimate, novel verdicts) must equal a plain-Scala replay from
  * the two collected signature sets.
  */
class IncrementalDedupAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("incrementalDedup == plain-Scala screen replay on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val (maxBucket, numReps, minJ) = (4, 8, 0.8)
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      def text(): String =
        Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // corpus: duplicate clusters (oversized vs maxBucket=4) + noise
      val cDocs = scala.collection.mutable.ArrayBuffer[String]()
      val clusterTexts = Seq.fill(2 + rnd.nextInt(2))(text())
      clusterTexts.foreach(t =>
        (0 until 3 + rnd.nextInt(8)).foreach(_ => cDocs += t))
      (0 until 4 + rnd.nextInt(4)).foreach(_ => cDocs += text())
      // batch: copies of cluster texts, near-dups, novels, one too-short
      val bDocs = clusterTexts.map(identity) ++
        clusterTexts.take(1).map(_ + " " + vocab(rnd.nextInt(vocab.size))) ++
        Seq.fill(3)(text()) ++ Seq("too short")
      val corpus = rnd.shuffle(cDocs.indices.map(_.toLong + 100).toVector)
        .zip(cDocs).toDF("doc_id", "text")
      val batch = bDocs.indices.map(i => (i.toLong + 1, bDocs(i)))
        .toDF("doc_id", "text")

      def sigsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        graft.ops.Dedup.minhashSignatures(df)
          .select(col("doc_id"), col("sig"))
          .as[(Long, Seq[Long])].collect().toMap
      val (nS, cS) = (sigsOf(batch), sigsOf(corpus))

      def bands(sigs: Map[Long, Seq[Long]]): Seq[(Long, Int, Long)] =
        sigs.toSeq.flatMap { case (id, sig) =>
          (0 until 16).map(b =>
            (id, b, h60(sig.slice(b * 8, b * 8 + 8).mkString(","))))
        }
      val cScreen = bands(cS).groupBy { case (_, b, h) => (b, h) }
        .toSeq.flatMap { case ((b, h), members) =>
          val ids = members.map(_._1)
          val keep =
            if (ids.size <= maxBucket) ids
            else ids.sortBy(id =>
              (graft.streaming.StreamingNearDup.h32(id), id)).take(numReps)
          keep.map(id => (b, h) -> id)
        }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val cand = bands(nS).flatMap { case (nid, b, h) =>
        cScreen.getOrElse((b, h), Set.empty).map(cid => (nid, cid))
      }.distinct
      def est(a: Seq[Long], b: Seq[Long]): Double =
        a.indices.count(i => a(i) == b(i)) / 128.0
      val rolled = cand.groupBy(_._1).map { case (nid, ps) =>
        val scored = ps.map { case (_, cid) => cid -> est(nS(nid), cS(cid)) }
        val best = scored.map(_._2).max
        nid -> (scored.size.toLong,
          scored.filter(_._2 == best).map(_._1).min, best)
      }
      val expRows = batch.select("doc_id").as[Long].collect().toSet.map { id: Long =>
        rolled.get(id) match {
          case Some((n, bm, be)) =>
            (id, n, Option(bm), Option(be), be < minJ)
          case None => (id, 0L, None: Option[Long], None: Option[Double], true)
        }
      }
      val got = graft.ops.Dedup.incrementalDedup(batch, corpus,
          maxBucket = maxBucket).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSet
      graft.core.Materialize.releaseAll(spark, blocking = true)
      assert(got == expRows,
        s"seed $seed: ${(got -- expRows).take(2)} vs ${(expRows -- got).take(2)}")
      // the sweep must exercise both the cap and a novel verdict
      assert(expRows.exists(_._5) && expRows.exists(!_._5), s"seed $seed weak")
    }
  }
}

/** Differential oracle for the pointer-jumping connected-components loop
  * (the engine's riskiest distributed iterative code — corpus_dedup and
  * semantic_dedup both stand on it): for random graphs spanning the
  * shapes that stress it differently (long chains = many rounds, stars =
  * wide fan-in, cycles, disjoint cliques, sparse noise), the emitted
  * (doc_id, cluster_id) labeling must equal a plain-Scala union-find
  * with min-id canonical labels.
  */
class ClustersAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical min-id labels (union-by-min keeps roots minimal)
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("clusters == union-find min-labels on random chain/star/cycle/clique graphs") {
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var base = 1L
      // long chain (forces several pointer-jumping rounds)
      val chain = (0 until 20 + rnd.nextInt(30)).map(i => base + i)
      chain.sliding(2).foreach(p => edges += ((p(0), p(1))))
      base += 100
      // star with a high-id hub (min label must flow inward)
      val hub = base + 50
      (0 until 10 + rnd.nextInt(10)).foreach(i => edges += ((hub, base + i)))
      base += 100
      // cycle
      val cyc = (0 until 5 + rnd.nextInt(10)).map(i => base + i)
      cyc.indices.foreach(i => edges += ((cyc(i), cyc((i + 1) % cyc.size))))
      base += 100
      // random sparse pairs
      (0 until 15).foreach { _ =>
        val a = base + rnd.nextInt(40); val b = base + rnd.nextInt(40)
        if (a != b) edges += ((a, b))
      }
      // shuffled orientation + duplicates (the operator must not care)
      val messy = rnd.shuffle(edges.toVector.map { case (a, b) =>
        if (rnd.nextBoolean()) (b, a) else (a, b)
      } ++ edges.take(5))
      val got = graft.ops.Dedup.clusters(messy.toDF("id1", "id2"))
        .select(col("doc_id"), col("cluster_id"))
        .as[(Long, Long)].collect().toMap
      val exp = unionFind(messy)
      assert(got == exp,
        s"seed $seed: ${(got.toSet -- exp.toSet).take(3)} vs ${(exp.toSet -- got.toSet).take(3)}")
    }
  }
}

/** Property checks for the r11e edit-distance family: the FastSS
  * candidate argument (ED ≤ k ⇒ the ≤k-deletion neighborhoods
  * intersect) is exactness-critical — a missed candidate is a silently
  * missing pair. Seeded scalacheck dictionaries over a 2-letter
  * alphabet maximize neighborhood collisions and near-miss pairs, far
  * beyond FuzzySpec's hand dictionary.
  */
class FuzzyAlgebraSpec extends SparkSpec {
  import org.scalacheck.{Gen, rng}
  import spark.implicits._

  private val genDict: Gen[List[String]] = for {
    n <- Gen.chooseNum(8, 24)
    strs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(0, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString)
  } yield strs

  test("editJoin == brute-force verify on seeded random dictionaries, k=1 and k=2") {
    (0 until 6).foreach { seed =>
      val dict = genDict.apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = dict.toDF("id", "s")
      for (k <- Seq(1, 2)) {
        val fast = graft.ops.Fuzzy.editJoin(df, "id", "s", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val brute = graft.ops.Fuzzy.editJoinBrute(df, "id", "s", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(fast == brute,
          s"seed=$seed k=$k missing=${(brute -- fast).take(3)} " +
            s"extra=${(fast -- brute).take(3)} dict=$dict")
      }
    }
  }
}

/** Cross-kernel consistency: longestRepeat (suffix order + adjacent
  * LCP) and exactSubstrPrune (w-gram occurrence counts) are INDEPENDENT
  * derivations of the same repeated-span structure — a document has a
  * repeated span of ≥ w words iff the prune removes something from it.
  * Checking the sets against each other on the real corpus validates
  * both kernels in one assertion.
  */
class ExactSubstrConsistencySpec extends SparkSpec {
  test("prune removes from exactly the docs whose longest repeat reaches w") {
    val docs = graft.core.Tables.table(spark, Sf0001, "documents")
    val byRepeat = graft.ops.Dedup.longestRepeat(docs).collect()
      .filter(_.getLong(1) >= 8L).map(_.getLong(0)).toSet
    graft.core.Materialize.releaseAll(spark, blocking = true)
    val byPrune = graft.ops.Dedup.exactSubstrPrune(docs).collect()
      .filter(_.getAs[Long]("n_removed") > 0L)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(byRepeat == byPrune,
      s"repeat-only=${(byRepeat -- byPrune).take(5)} " +
        s"prune-only=${(byPrune -- byRepeat).take(5)}")
    assert(byRepeat.nonEmpty, "the corpus plants repeated spans")
  }
}
