package graft.tools
import org.apache.spark.sql.SparkSession

/** Empty-corpus robustness sweep: run every registry query against
  * zero-row copies of all tables (schemas preserved) and report which
  * queries crash instead of returning an empty (or empty-model) result —
  * the 2am empty-partition scenario a 100 TB pipeline hits whenever an
  * upstream filter drops a day's data.
  */
object EmptySweep {
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
    val dir = args.headOption.getOrElse("/tmp/sf_empty")
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
    val fs = failures(spark, dir)
    if (fs.isEmpty) println("[emptysweep] clean: every query tolerates an empty corpus")
    else fs.foreach { case (n, m) => println(s"[emptysweep] $n: $m") }
    spark.stop()
  }
}
