package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.mutable

/** Live corpus heavy hitters — the streaming sibling of
  * TextAnalysis.heavyHitters. Each micro-batch aggregates DISTRIBUTED
  * (the same mergeable MisraGries two-phase aggregate as batch: map
  * tasks shrink to ≤k−1 counters pre-shuffle); only the batch's
  * ≤(k−1)-entry summary reaches the driver, where it merges into the
  * running sketch with the identical offset-subtraction step. The
  * mergeable-summaries bound therefore holds over the WHOLE stream:
  * after any number of batches, every term with total frequency > n/k is
  * present with total − n/k ≤ estimate ≤ total (guarantee spec-pinned
  * across batch splits).
  *
  * RECOVERY SEMANTICS: foreachBatch is at-least-once, so after a failure
  * the last uncommitted micro-batch can replay — the tracker records the
  * last absorbed batchId and skips replays, keeping absorption
  * exactly-once WITHIN a tracker's lifetime. The tracker itself is
  * driver-memory state: a checkpoint restart resumes the QUERY from the
  * next unprocessed batch but the new Tracker starts EMPTY — the
  * whole-stream n/k guarantee then covers only post-restart data. A
  * deployment that must survive driver loss should persist
  * `tracker.sketch`/`tracker.n` periodically and seed a new tracker via
  * `absorbSnapshot` (sketches merge, so a saved sketch is a valid
  * summary of everything before the save).
  */
object StreamingHeavyHitters {

  /** Driver-side running sketch. Thread-safe for the single-writer
    * foreachBatch callback + concurrent readers.
    */
  final class Tracker(k: Int) {
    private val mg = new MisraGries(k)
    private val state = mutable.HashMap.empty[String, Long]
    @volatile private var snapshot: Map[String, Long] = Map.empty
    @volatile private var total: Long = 0L
    @volatile private var lastBatchId: Long = -1L

    /** Merge one micro-batch summary; idempotent on batchId so an
      * at-least-once replay of the same batch is absorbed once.
      */
    private[graft] def absorb(batchId: Long, batchSketch: Map[String, Long],
                                  batchN: Long): Unit =
      synchronized {
        if (batchId > lastBatchId) {
          lastBatchId = batchId
          mg.merge(state, mutable.HashMap(batchSketch.toSeq: _*))
          snapshot = state.toMap
          total += batchN
        }
      }

    /** Seed from a persisted (sketch, n) snapshot — the recovery path for
      * a restarted driver (see object scaladoc). Not batchId-guarded: a
      * snapshot is not a micro-batch.
      */
    def absorbSnapshot(savedSketch: Map[String, Long], savedN: Long): Unit =
      synchronized {
        mg.merge(state, mutable.HashMap(savedSketch.toSeq: _*))
        snapshot = state.toMap
        total += savedN
      }

    def sketch: Map[String, Long] = snapshot
    def n: Long = total
    /** The full sketch, sorted by estimate desc (then term). Every entry
      * is a candidate: the MG bound est ≤ true ≤ est + n/k means any
      * surviving counter could belong to a true heavy hitter, so no
      * estimate-threshold filter is sound for pruning — callers wanting
      * only CONFIRMED hitters must rescan with the exact counts.
      */
    def candidates: Seq[(String, Long)] =
      snapshot.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  /** `terms`: a streaming single-column ("term") frame. Returns the
    * running query plus the tracker to read between/after batches.
    */
  def run(terms: DataFrame, k: Int = 32,
          checkpoint: Option[String] = None): (StreamingQuery, Tracker) = {
    val tracker = new Tracker(k)
    val sink: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      val agg = udaf(new MisraGries(k), ExpressionEncoder[String]())
      val row = batch.agg(agg(col("term")).as("mg"), count(lit(1)).as("n")).head()
      tracker.absorb(batchId, Map(row.getMap[String, Long](0).toSeq: _*), row.getLong(1))
    }
    val w = terms.writeStream.outputMode("append").foreachBatch(sink)
    (checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start(), tracker)
  }
}
