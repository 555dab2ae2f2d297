package graft

import graft.core.Tables
import graft.ops.Fuzzy
import org.apache.spark.sql.functions.col

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int) =
    Fuzzy.editJoin(df, "id", "s", k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private lazy val dict = Seq(
    (1L, "abcd"), (2L, "abc"), (3L, "abxd"), (4L, "abcde"),
    (5L, "zzzz"), (6L, "ab"), (7L, "abcd")).toDF("id", "s")

  test("editJoin k=1: insertion, deletion, substitution, identical — " +
    "and ED-2 pairs excluded") {
    assert(pairs(dict, 1) == Set(
      (1L, 2L, 1L),  // deletion
      (1L, 3L, 1L),  // substitution
      (1L, 4L, 1L),  // insertion
      (2L, 6L, 1L),  // deletion
      (1L, 7L, 0L),  // identical strings, distinct ids
      (2L, 7L, 1L), (3L, 7L, 1L), (4L, 7L, 1L))) // 7 mirrors 1's pairs
  }

  test("editJoin k=2 widens exactly to the ED-2 pairs") {
    val p1 = pairs(dict, 1)
    val p2 = pairs(dict, 2)
    assert(p2.filter(_._3 <= 1L) == p1, "k=2 must keep every k=1 pair")
    assert(p2 -- p1 == Set(
      (1L, 6L, 2L), (2L, 3L, 2L), (2L, 4L, 2L),
      (3L, 4L, 2L), (3L, 6L, 2L), (6L, 7L, 2L)))
  }

  test("editJoin equals the brute-force verify on an adversarial " +
    "dictionary (repeats, prefixes, empty string) at k=1 and k=2") {
    // deterministic dictionary exercising shared deletion signatures:
    // runs of a repeated char (many deletions collide), chains of
    // prefixes, and the empty string
    val strs = (Seq("", "a", "aa", "aaa", "aaaa", "ab", "ba", "aba",
      "bab", "abab", "baba", "abcdef", "abcdeg", "abdcef", "bacdef",
      "abcde", "abcdefg", "xyz", "xyzz", "xzyz", "zxyz") ++
      (1 to 9).map(i => s"key00$i") ++ Seq("key010", "kex001", "ke0y01"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val fast = pairs(df, k)
      val brute = Fuzzy.editJoinBrute(df, "id", "s", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == brute, s"FastSS must be exact at k=$k")
      assert(brute.nonEmpty)
    }
  }

  test("editCluster: typo chains close transitively, singletons keep " +
    "themselves, keeper = component min id") {
    // chain: "abcd" - "abcx" - "abxx" (pairwise ED 1, ends ED 2) must
    // land in ONE cluster labeled by the min id, even though the ends
    // are 2 edits apart; "zzzz" stays a singleton that keeps itself
    val df = Seq((5L, "abcd"), (6L, "abcx"), (7L, "abxx"), (8L, "zzzz"))
      .toDF("id", "s")
    val r = Fuzzy.editCluster(df, "id", "s").collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("cluster_id"), x.getAs[Boolean]("keep")))).toMap
    assert(r(5L) == ((5L, true)))
    assert(r(6L) == ((5L, false)))
    assert(r(7L) == ((5L, false)), "transitive closure over the chain")
    assert(r(8L) == ((8L, true)), "singleton keeps itself")
  }

  test("editCluster: real supplier names — one keeper per component, " +
    "every row returns, partitioning-invariant") {
    val sup = Tables.table(spark, Sf0001, "supplier")
    val out = Fuzzy.editCluster(sup, "s_suppkey", "s_name")
    val a = out.orderBy("id").collect().toSeq
    assert(a.size == sup.count(), "spine: one row per input name")
    val byCluster = a.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) == 1,
        s"exactly one keeper in cluster $cid")
      assert(rows.map(_.getAs[Long]("id")).min == cid,
        s"cluster label must be the member min id ($cid)")
    }
    val b = Fuzzy.editCluster(sup.repartition(7), "s_suppkey", "s_name")
      .orderBy("id").collect().toSeq
    assert(a == b, "CC labels must be partitioning-invariant")
  }

  test("editJoin raises LOUDLY past maxLen, passes in-contract and " +
    "null strings — the packed-key-headroom convention") {
    val long = Seq((1L, "a" * 65), (2L, "abcd")).toDF("id", "s")
    val e = intercept[Exception] {
      Fuzzy.editJoin(long, "id", "s").collect()
    }
    assert(e.getMessage.contains("exceeds maxLen=64"),
      s"raise must name the contract, got: ${e.getMessage}")
    // widening the knob explicitly admits the same data
    assert(Fuzzy.editJoin(long, "id", "s", 1, 128).count() == 0L)
    // exactly-at-the-boundary strings are in contract
    val edge = Seq((1L, "a" * 64), (2L, "a" * 63)).toDF("id", "s")
    assert(pairs(edge, 1) == Set((1L, 2L, 1L)))
    // null strings drop silently (zero signature rows), never raise
    val withNull = Seq((1L, "abcd"), (2L, null), (3L, "abcx"))
      .toDF("id", "s")
    assert(pairs(withNull, 1) == Set((1L, 3L, 1L)))
    // the guard rides editCluster and the streaming screen too
    intercept[Exception] {
      Fuzzy.editCluster(long, "id", "s").collect()
    }
  }

  test("deletions: explicit empty-string guard (no reliance on the " +
    "descending-sequence surprise)") {
    val r = Seq(Tuple1("")).toDF("s")
      .select(Fuzzy.deletions(col("s")).as("d")).head()
    assert(r.getSeq[String](0).isEmpty, "deletions('') must be []")
  }

  test("editJoin: real supplier names — matches brute force, " +
    "partitioning-invariant") {
    val sup = Tables.table(spark, Sf0001, "supplier")
      .selectExpr("s_suppkey AS id", "s_name AS s")
    val a = pairs(sup, 1)
    val brute = Fuzzy.editJoinBrute(sup, "id", "s", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == brute && a.nonEmpty,
      "one-digit-apart supplier names are ED-1 pairs")
    assert(pairs(sup.repartition(7), 1) == a)
  }
}
