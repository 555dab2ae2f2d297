package graft.tools

import org.apache.spark.sql.SparkSession

/** Partitioning-invariance sweep: run every registry query under the
  * session's production conf AND under an adversarial conf (different
  * shuffle-partition count, AQE off, parquet scans split into many small
  * input partitions) and report any query whose SORTED result set
  * changes. This enforces, registry-wide, the determinism claims the
  * engine makes operator-by-operator (exact decimal partial sums,
  * integer-scaled PageRank, range-partition ranks, packed-argmin
  * windows): on a real cluster the partition count is whatever the
  * scheduler gives you, so a result that depends on it is a latent
  * 2am wrong-answer — and a flaky oracle — not a style issue.
  *
  * The adversarial leg varies all three partitioning axes a cluster
  * varies: shuffle width (7, coprime to the session's), runtime
  * re-planning (AQE off — no coalescing to paper over width-sensitive
  * plans), and SCAN splits (tiny maxPartitionBytes/openCost so each
  * parquet file fans into many input partitions — map-side partial
  * aggregation then runs over genuinely different row groupings).
  */
object InvarianceSweep {

  private val alt = Map(
    "spark.sql.shuffle.partitions" -> "7",
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.files.maxPartitionBytes" -> "262144",
    "spark.sql.files.openCostInBytes" -> "0")

  def failures(spark: SparkSession, dir: String,
               only: Option[Set[String]] = None): Seq[(String, String)] = {
    val saved = alt.keys.map(k => k -> spark.conf.getOption(k)).toMap
    def setAll(m: Map[String, String]): Unit =
      m.foreach { case (k, v) => spark.conf.set(k, v) }
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    def canon(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): String =
      graft.core.Materialize.inScope { scope =>
        try fn(spark, dir).collect().map(_.toString).sorted.mkString("\n")
        finally scope.release(spark, blocking = true)
      }
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (name, fn) =>
        try {
          val a = canon(fn)
          val b = try { setAll(alt); canon(fn) } finally restore()
          if (a == b) None
          else {
            val diff = a.linesIterator.zipAll(b.linesIterator, "<missing>", "<missing>")
              .zipWithIndex.collectFirst { case ((x, y), i) if x != y =>
                s"row $i: prod=$x alt=$y" }
            Some(name -> ("results differ across partitionings (" +
              s"${a.linesIterator.size} vs ${b.linesIterator.size} rows; " +
              s"first diff ${diff.getOrElse("row count")})"))
          }
        } catch { case e: Throwable =>
          restore()
          Some(name -> (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString))
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val fs = failures(spark, dir,
      if (args.length > 1) Some(args(1).split(",").toSet) else None)
    val secs = (System.nanoTime() - t0) / 1e9
    if (fs.isEmpty)
      println(f"[invariance] clean: every query partition-invariant ($secs%.1f s)")
    else fs.foreach { case (n, m) => println(s"[invariance] $n: $m") }
    spark.stop()
  }
}
