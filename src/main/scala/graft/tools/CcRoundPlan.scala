package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic (not part of any contract): print the EXECUTED (post-AQE)
  * plan of one CC round and the per-job stage breakdown, to attribute the
  * per-round job count. Mirrors Dedup.clusters' round body.
  * Usage: runMain graft.tools.CcRoundPlan <sfDir>
  */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler._
    val stages = new scala.collection.mutable.LinkedHashMap[Int, String]
    val jobsOfInterest = new scala.collection.mutable.LinkedHashMap[Int, Seq[Int]]
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) jobsOfInterest(e.jobId) = e.stageInfos.map(_.stageId)
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (record) stages(e.stageInfo.stageId) =
          s"${e.stageInfo.name} tasks=${e.stageInfo.numTasks}"
    })
    // build the mutual kNN edge frame like knn_components does
    val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
    val g = graft.core.Materialize.once(
      graft.ops.Ivf.knnGraph(emb)
        .select(col("vec_id").as("a"), col("neighbor_id").as("b")))
    val mutual = g
      .join(g.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
      .where(col("a") < col("b"))
      .select(col("a").as("id1"), col("b").as("id2"))
    // replicate clusters' internals
    val pre = graft.core.Materialize.cut(
      mutual.select(col("id1").as("a"), col("id2").as("b"))
        .unionByName(mutual.select(col("id2").as("a"), col("id1").as("b")))
        .repartition(col("b"))
        .dropDuplicates("a", "b"))
    val nParts = math.max(pre.rdd.getNumPartitions, 2)
    val edges = graft.core.Materialize.cutPartitioned(
      pre.repartition(nParts, col("b")).sortWithinPartitions("b"),
      Seq("b"), nParts, sortedBy = Seq("b"))
    println(s"edges partitions = $nParts")
    println("edges outputPartitioning: " +
      edges.queryExecution.executedPlan.outputPartitioning)
    var labels = graft.core.Materialize.cutPartitioned(
      edges.repartition(nParts, col("a"))
        .groupBy(col("a"))
        .agg(least(col("a"), min(col("b"))).as("cluster_id"))
        .select(col("a").as("doc_id"), col("cluster_id")),
      Seq("doc_id"), nParts)
    println("labels outputPartitioning: " +
      labels.queryExecution.executedPlan.outputPartitioning)
    val viaNeighbor = edges
      .join(labels.select(col("doc_id").as("b"), col("cluster_id").as("cand")), "b")
      .select(col("a").as("doc_id"), col("cand"))
    val viaPointer = labels.as("l1")
      .join(labels.as("l2"), col("l1.cluster_id") === col("l2.doc_id"))
      .select(col("l1.doc_id").as("doc_id"), col("l2.cluster_id").as("cand"))
    val next0 = viaNeighbor.unionByName(viaPointer)
      .repartition(nParts, col("doc_id"))
      .groupBy(col("doc_id")).agg(min(col("cand")).as("cluster_id"))
    record = true
    val sumDf = next0.agg(coalesce(sum(col("cluster_id").cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)")).as("s"))
    val s = sumDf.head().getDecimal(0)
    record = false
    Thread.sleep(500)
    println(s"labelSum = $s")
    println("=== jobs of the round action ===")
    jobsOfInterest.foreach { case (j, st) =>
      println(s"job $j stages=${st.mkString(",")}")
    }
    stages.foreach { case (id, n) => println(s"stage $id: $n") }
    println("=== executed (final AQE) plan of the round ===")
    println(sumDf.queryExecution.executedPlan.toString.take(12000))
    graft.core.Materialize.releaseAll(spark, blocking = true)
    spark.stop()
  }
}
