package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-duplicate detection: each arriving document is
  * checked against every previously-seen document that shares an LSH band
  * bucket, emitting (id1, id2, est_jaccard) candidate pairs live — the
  * streaming counterpart of Dedup.minhashLsh (exact-hash streaming dedup
  * already exists as `dropDuplicatesWithinWatermark`; this one catches
  * NEAR duplicates).
  *
  * Scale design: signatures are the same fused map-side ShingleMinHash
  * pass as batch; state is keyed by (band, bucket) and holds at most
  * `maxBucket` signatures per bucket — once full, newcomers pair against
  * `numReps` HASH-SAMPLED retained members (portable md5-prefix order,
  * exactly the batch skew-cap policy: a min-id representative misses
  * every cluster but its own in a mixed boilerplate bucket, a content-
  * hash sample covers a cluster holding fraction f of the bucket with
  * probability 1 − (1−f)^numReps). `idleRetention` (event-time timeout)
  * drops buckets
  * idle past the horizon, bounding total state for unbounded streams at
  * the documented cost of missing duplicates farther apart than the
  * horizon. A pair sharing several bands is emitted once per band
  * (at-least-once); feed emissions through dropDuplicates downstream if
  * exactly-once pairs matter.
  */
object StreamingNearDup {

  case class Banded(band: Int, bsig: Long, doc_id: Long,
                    ts: java.sql.Timestamp, sig: Seq[Long])
  case class Bucket(docs: List[(Long, Seq[Long])])
  case class Pair(id1: Long, id2: Long, est_jaccard: Double)

  /** JVM-side md5-prefix hash, value-identical to Dedup.hash32 on the
    * decimal string (first 4 digest bytes as an unsigned int).
    */
  private[graft] def h32(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** `docs`: streaming (doc_id, ts, text). */
  def run(docs: DataFrame, numPerm: Int = 128, bands: Int = 16,
          maxBucket: Int = 100, numReps: Int = 8,
          watermark: String = "10 minutes",
          idleRetentionMs: Long = 3600000L): Dataset[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numPerm / bands

    val sigs = docs.withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        Dedup.minhashSig(col("text"), numPerm).as("sig"))
      .where(col("sig").isNotNull)
    // stay in column space: a typed map would re-serialize `ts` and lose
    // the event-time watermark attribute the state timeout needs
    val banded = sigs.select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          Dedup.bandSig(col("sig"), b, rows)): _*)))
      .toDF("doc_id", "ts", "sig", "band", "bsig")
      .select(col("band"), col("bsig"), col("doc_id"), col("ts"), col("sig"))
      .as[Banded]

    banded.groupByKey(b => (b.band, b.bsig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), evts: Iterator[Banded], state: GroupState[Bucket]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var bucket = state.getOption.getOrElse(Bucket(Nil))
            val out = List.newBuilder[Pair]
            var maxTs = 0L
            // deterministic processing order within the micro-batch
            evts.toSeq.sortBy(e => (e.ts.getTime, e.doc_id)).foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              val peers =
                if (bucket.docs.size >= maxBucket)
                  // hash-sampled representatives (the batch cap policy)
                  bucket.docs.sortBy(d => (h32(d._1), d._1)).take(numReps)
                else bucket.docs
              peers.foreach { case (oid, osig) =>
                if (oid != e.doc_id) {
                  var matches = 0
                  var i = 0
                  val n = math.min(osig.length, e.sig.length)
                  while (i < n) { if (osig(i) == e.sig(i)) matches += 1; i += 1 }
                  out += Pair(math.min(oid, e.doc_id), math.max(oid, e.doc_id),
                    matches.toDouble / numPerm)
                }
              }
              if (bucket.docs.size < maxBucket &&
                  !bucket.docs.exists(_._1 == e.doc_id))
                bucket = Bucket((e.doc_id, e.sig) :: bucket.docs)
            }
            state.update(bucket)
            // clamp to just past the current watermark: a timeout at or
            // before the watermark throws IllegalArgumentException, and
            // maxTs + idleRetention can land there when the bucket's
            // newest event trails the batch's max event time by more than
            // the idle horizon (or idleRetention is 0)
            if (maxTs > 0)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1, maxTs + idleRetentionMs))
            out.result().iterator
          }
        })
  }
}
