package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI for the LLM-training-data side of the engine: run the curation
  * pass over a documents table, write the per-doc decision record and the
  * surviving corpus (with PII scrubbed metadata columns), report stage
  * counts — the corpus counterpart of the candle-side Ingest/Backfill.
  *
  * Usage: Pipeline <documentsParquet> <outDir> [minScore]
  *
  * Output layout:
  *   outDir/decisions/   doc_id, norm_fp, score, passed_quality, kept
  *   outDir/corpus/      kept docs joined with pii-scrub stats
  */
object Pipeline {

  /** The job body, session-agnostic for reuse/testing: writes both
    * outputs, returns (total docs, kept docs). `main` owns the session.
    */
  def run(spark: SparkSession, docsPath: String, outDir: String,
          minScore: Double = 0.42): (Long, Long) = {
    val docs = spark.read.parquet(docsPath)
    val decisions = graft.ops.TextAnalysis.curate(docs, minScore)
    decisions.write.mode("overwrite").parquet(s"$outDir/decisions")

    val kept = spark.read.parquet(s"$outDir/decisions").where(col("kept"))
    val corpus = docs.join(kept.select("doc_id"), "doc_id")
      .join(graft.ops.TextAnalysis.piiScrub(docs)
        .select("doc_id", "n_emails", "n_digit_runs"), "doc_id")
    corpus.write.mode("overwrite").parquet(s"$outDir/corpus")
    (docs.count(), kept.count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Pipeline <documentsParquet> <outDir> [minScore]")
    val Array(docsPath, outDir) = args.take(2)
    val minScore = args.lift(2).map(_.toDouble).getOrElse(0.42)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (total, nKept) = run(spark, docsPath, outDir, minScore)
    println(s"""{"docs":$total,"kept":$nKept,"filtered":${total - nKept},"min_score":$minScore}""")
    spark.stop()
  }
}
