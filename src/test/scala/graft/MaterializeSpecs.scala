package graft

import graft.core.Materialize
import org.apache.spark.sql.functions._

/** Session-hygiene contract for the materialization registry: every
  * localCheckpoint block handed out by Materialize is tracked, and
  * release() at a query boundary returns the context's persisted-RDD
  * population to its pre-query baseline — the leak behind the round-4
  * dedup_minhash/simhash bench regression.
  */
class MaterializeSpecs extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("once() tracks its checkpoint block and release() drops it") {
    Materialize.release(spark, blocking = true) // clean slate
    val before = persistedIds
    val df = Materialize.once(
      spark.range(10000).select(col("id"), (col("id") * 2).as("x")))
    assert(df.count() == 10000)
    assert(Materialize.liveBlockCount(spark) >= 1,
      "lazy cut must be tracked as a live block after its first action")
    assert((persistedIds -- before).nonEmpty)
    Materialize.release(spark, blocking = true)
    assert(Materialize.liveBlockCount(spark) == 0)
    assert(persistedIds == before,
      "release() must return the persisted-RDD set to the pre-query baseline")
  }

  test("cut() (eager) is tracked and released the same way") {
    Materialize.release(spark, blocking = true)
    val before = persistedIds
    val df = Materialize.cut(spark.range(5000).toDF("id"))
    assert(df.count() == 5000)
    assert(Materialize.liveBlockCount(spark) >= 1)
    Materialize.release(spark, blocking = true)
    assert(persistedIds == before)
  }

  test("release() leaves caller-persisted frames alone") {
    Materialize.release(spark, blocking = true)
    val user = spark.range(1000).toDF("id").persist()
    user.count()
    val mat = Materialize.once(spark.range(1000).toDF("id"))
    mat.count()
    Materialize.release(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "a frame the USER persisted must survive registry release")
    assert(user.count() == 1000)
    user.unpersist(blocking = true)
  }

  test("a multi-cut query releases every block in one call") {
    Materialize.release(spark, blocking = true)
    val before = persistedIds
    val a = Materialize.once(spark.range(100).toDF("id"))
    val b = Materialize.once(a.select((col("id") + 1).as("id")))
    val c = Materialize.cut(b.select((col("id") * 3).as("id")))
    assert(c.agg(sum("id")).head().getLong(0) == (1 to 100).map(_ * 3L).sum)
    assert(Materialize.liveBlockCount(spark) >= 3)
    Materialize.release(spark, blocking = true)
    assert(Materialize.liveBlockCount(spark) == 0)
    assert(persistedIds == before)
  }
}
