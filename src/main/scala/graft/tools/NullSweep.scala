package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Null-dirt robustness sweep: run every registry query against a copy
  * of the corpus where each table carries extra rows whose string,
  * floating, decimal, and timestamp columns are NULL (integer keys
  * survive, so joins still resolve). This is the malformed-feed
  * scenario a 100 TB ingest hits daily — a crawler emits a document
  * with no text, an exchange feed drops a price, a schema migration
  * leaves a column null for a day. The contract mirrors EmptySweep's:
  * null-essential rows produce empty/skipped RESULTS (dropped at the
  * op's own boundary), never a driver crash.
  */
object NullSweep {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Writes the dirtied copy: first `n` rows of each table plus those
    * same rows re-emitted with nullable non-integer columns NULLed.
    */
  def writeDirty(spark: SparkSession, srcDir: String, dstDir: String,
      n: Int = 20): Unit = tables.foreach { t =>
    val df = spark.read.parquet(s"$srcDir/$t.parquet").limit(n)
    val nulled = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case StringType | DoubleType | FloatType | _: DecimalType |
             TimestampType | TimestampNTZType | _: ArrayType =>
          lit(null).cast(f.dataType).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
    df.unionByName(nulled).write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
  }

  def failures(spark: SparkSession, dir: String): Seq[(String, String)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      graft.core.Materialize.inScope { scope =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(name -> (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString))
        }
        finally scope.release(spark, blocking = true)
      }
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // bounded-buffer udaf aggregates must keep HASH aggregation past
      // 128 keys (see GraftSession: the 49 GB knn spill finding)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 18).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_null").toString
    try {
      writeDirty(spark, src, dir)
      val fs = failures(spark, dir)
      if (fs.isEmpty) println("[nullsweep] clean: every query tolerates null-dirtied rows")
      else fs.foreach { case (n, m) => println(s"[nullsweep] $n: $m") }
    } finally {
      deleteRecursively(dir)
      spark.stop()
    }
  }

  /** Remove a sweep's dirtied-parquet temp directory — repeated CI/test
    * runs otherwise accumulate full corpus copies under /tmp.
    */
  def deleteRecursively(dir: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    val root = Paths.get(dir)
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
  }
}
