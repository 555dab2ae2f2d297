package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata, partitioned like any other
  * table. The decode step itself is STUBBED (no media libraries in this
  * container) with a deterministic content-derived fake; the Spark-side
  * contract — binary input column, batched per-partition decode, fixed
  * typed output schema — is the real thing a cluster deployment swaps a
  * codec into.
  */
object Multimodal {

  /** Typed metadata over the opaque-binary representation used for media.
    * The binary payload itself stays internal (emitted as a hex preview so
    * downstream compares stay engine-portable); `decodeStub` consumes the
    * raw binary column.
    */
  def meta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs.select(
      col("doc_id"),
      length(payload).cast("long").as("n_bytes"),
      md5(payload).as("content_md5"),
      substring(hex(payload), 1, 16).as("payload_hex_prefix"),
      lit("text").as("modality"))
  }

  /** Frame-sampling schedule for video-modality rows: one output row per
    * frame to extract — uniform `everyMs` stride, capped at `maxFrames`
    * per clip. This explode IS the real distributed planning step of
    * video processing: it fans a clip corpus into per-frame decode work
    * items that partition/shuffle like any other rows (the decode itself
    * is the stubbed codec boundary, see decodeStub). Duration here
    * derives from the payload length — the testbed stand-in for a real
    * container-parsed duration column.
    */
  def frameSample(docs: DataFrame, everyMs: Long = 100, maxFrames: Int = 8): DataFrame =
    docs.select(col("doc_id"), length(col("text")).cast("long").as("duration_ms"))
      .withColumn("n_frames",
        least(floor(col("duration_ms") / lit(everyMs)).cast("long") + 1L,
          lit(maxFrames.toLong)))
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .select(col("doc_id"), col("duration_ms"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("frame_ts_ms"))

  /** Batched decode/feature-extract stub. Batch size 64 mirrors a
    * vectorized decode unit (what a GPU/SIMD codec would consume at once).
    * Replace the body of `fakeDecode` with a real codec in deployment.
    *
    * The stub's outputs are md5-derived scalars (not an opaque float
    * array), so the result is sortable/hashable by any downstream compare
    * harness and replayable in SQL: width/height come from the first
    * 8 md5 hex chars, feature f_i from hex chars [2i, 2i+2) over 255.
    */
  def decodeStub(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fakeDecode(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Array[Double]) = {
      // STUB: deterministic content-derived metadata + feature vector.
      val hexD = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hexD.substring(0, 8), 16)
      val w = 16 + h % 64
      val ht = 16 + (h >> 8) % 64
      val feat = Array.tabulate(8)(i =>
        java.lang.Long.parseLong(hexD.substring(2 * i, 2 * i + 2), 16) / 255.0)
      (id, w, ht, 3L, feat)
    }

    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        val (i, w, h, c, f) = fakeDecode(id, bytes)
        (i, w, h, c, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }))
      .toDF("doc_id", "width", "height", "channels",
        "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
  }
}
