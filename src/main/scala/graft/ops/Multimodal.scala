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

  /** Batched decode/feature-extract stub. Batch size 64 mirrors a
    * vectorized decode unit (what a GPU/SIMD codec would consume at once).
    * Replace the body of `fakeDecode` with a real codec in deployment.
    */
  def decodeStub(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fakeDecode(id: Long, bytes: Array[Byte]): (Long, Int, Int, Int, Array[Float]) = {
      // STUB: deterministic content-derived metadata + feature vector.
      val h = java.util.Arrays.hashCode(bytes)
      val w = 16 + math.floorMod(h, 64)
      val ht = 16 + math.floorMod(h >> 8, 64)
      val feat = Array.tabulate(8)(i => math.floorMod(h >> i, 256).toFloat / 255f)
      (id, w, ht, 3, feat)
    }

    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        fakeDecode(id, bytes)
      }))
      .toDF("doc_id", "width", "height", "channels", "feature")
  }
}
