package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: reproduce the r16layout 20M-edge heap exhaustion with
  * stage-level attribution. Usage: runMain graft.tools.CcOomRepro [n]
  */
object CcOomRepro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = graft.core.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        System.err.println(s"[stage ${e.stageInfo.stageId}] tasks=${e.stageInfo.numTasks} ${e.stageInfo.name.take(90)}")
    })
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    val pairs = spark.range(n)
      .where(col("id") % 64 =!= 63)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val t0 = System.nanoTime()
    val labels = graft.ops.Dedup.clusters(pairs)
    println(s"rows=${labels.count()} wall=${(System.nanoTime() - t0) / 1e9}")
    graft.core.Materialize.releaseAll(spark, blocking = true)
    spark.stop()
  }
}
