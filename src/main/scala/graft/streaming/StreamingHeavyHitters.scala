package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
  */
object StreamingHeavyHitters {

  /** Driver-side running sketch. Thread-safe for the single-writer
    * foreachBatch callback + concurrent readers.
    */
  final class Tracker(k: Int) {
    private val mg = new MisraGries(k)
    @volatile private var state: Map[String, Long] = Map.empty
    @volatile private var total: Long = 0L

    private[streaming] def absorb(batchSketch: Map[String, Long], batchN: Long): Unit =
      synchronized {
        state = mg.merge(state, batchSketch)
        total += batchN
      }

    def sketch: Map[String, Long] = state
    def n: Long = total
    /** Terms whose estimate clears the n/k fence (superset of the true
      * heavy hitters by the MG guarantee uses estimate+n/k ≥ true).
      */
    def candidates: Seq[(String, Long)] = state.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  /** `terms`: a streaming single-column ("term") frame. Returns the
    * running query plus the tracker to read between/after batches.
    */
  def run(terms: DataFrame, k: Int = 32,
          checkpoint: Option[String] = None): (StreamingQuery, Tracker) = {
    val tracker = new Tracker(k)
    val sink: (Dataset[Row], Long) => Unit = (batch, _) => {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      val agg = udaf(new MisraGries(k), ExpressionEncoder[String]())
      val row = batch.agg(agg(col("term")).as("mg"), count(lit(1)).as("n")).head()
      tracker.absorb(Map(row.getMap[String, Long](0).toSeq: _*), row.getLong(1))
    }
    val w = terms.writeStream.outputMode("append").foreachBatch(sink)
    (checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start(), tracker)
  }
}
