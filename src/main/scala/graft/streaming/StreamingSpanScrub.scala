package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live SPAN-SCRUB: arriving documents are rewritten with every word
  * position covered by a `w`-gram from a STATIC dictionary (benchmark
  * passages, known boilerplate) removed — the serving face of
  * `Dedup.spanScrub`, protecting a live ingest from quoting eval
  * suites before anything lands on disk.
  *
  * Scale design: completely STATELESS and SHUFFLE-FREE on the stream —
  * not even an explode/regroup: the dictionary collapses to ONE sorted
  * array of distinct gram hash32s (dim-scale contract: eval suites and
  * boilerplate lists, not crawls — the batch op handles corpus-scale
  * dictionaries) carried by a broadcast single-row cross join, and the
  * whole gram/coverage/rebuild pipeline runs INSIDE each row as pure
  * column logic (transform/filter/zip_with over the word array). Every
  * arrival emits exactly one row: (doc_id, ts, n_words, n_removed,
  * text).
  */
object StreamingSpanScrub {

  private def hash32(c: Column): Column = graft.functions.md5_prefix_long(c, 8)

  private def emptyInts: Column = array().cast("array<int>")

  /** `stream`: streaming (doc_id, ts, text); `dict`: static documents
    * whose w-grams form the scrub dictionary.
    */
  def run(stream: DataFrame, dict: DataFrame, w: Int = 8): DataFrame = {
    require(w >= 2, "w >= 2")
    stream.crossJoin(broadcast(graft.ops.Dedup.dictGramArray(dict, w)))
      .withColumn("ws", coalesce(
        filter(split(col("text"), "\\s+"), _ =!= ""),
        array().cast("array<string>")))
      .withColumn("gh", when(size(col("ws")) >= w,
        transform(sequence(lit(0), size(col("ws")) - w),
          i => hash32(concat_ws(" ", slice(col("ws"), i + 1, lit(w))))))
        .otherwise(array().cast("array<bigint>")))
      .withColumn("starts", when(size(col("gh")) > 0,
        filter(sequence(lit(0), size(col("gh")) - 1),
          i => array_contains(col("dg"), element_at(col("gh"), i + 1))))
        .otherwise(emptyInts))
      .withColumn("cov", array_distinct(flatten(
        transform(col("starts"), s0 => sequence(s0, s0 + (w - 1))))))
      .withColumn("kept", filter(
        zip_with(col("ws"),
          when(size(col("ws")) > 0,
            sequence(lit(0), size(col("ws")) - 1)).otherwise(emptyInts),
          (wd, p) => struct(wd.as("w"), p.as("p"))),
        x => !array_contains(col("cov"), x.getField("p"))))
      .select(col("doc_id"), col("ts"),
        size(col("ws")).cast("long").as("n_words"),
        size(col("cov")).cast("long").as("n_removed"),
        array_join(transform(col("kept"), x => x.getField("w")), " ")
          .as("text"))
  }
}
