package graft

/** Empty-corpus robustness, enforced for the WHOLE registry: zero-row
  * inputs are what every 100 TB pipeline feeds an operator the day an
  * upstream filter drops a partition — the contract is empty RESULTS
  * (or an empty model propagating to empty results), never a driver
  * crash. The r11 sweep found nine violations (ANN train/encode paths
  * calling `.head` on an empty centroid/seed matrix; a zero-row Bloom
  * aggregation yielding a null-buffer filter that NPEs on probe); the
  * guards live at the shared primitives (Ivf.assign, pqEncoded,
  * bloomScreenDedup) and this spec keeps the class of bug extinct.
  */
class EmptySweepSpec extends SparkSpec {

  test("every registry query tolerates an empty corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$Sf0001/$t.parquet").limit(0)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      val fs = graft.tools.EmptySweep.failures(spark, dir)
      assert(fs.isEmpty, "queries crashing on an empty corpus:\n" +
        fs.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally graft.tools.NullSweep.deleteRecursively(dir)
  }

  test("every registry query tolerates null-dirtied rows") {
    // each table carries extra rows whose string/floating/decimal/
    // timestamp/array columns are NULL (keys survive) — the malformed-
    // feed scenario. The r11 sweep found 38 crashes in three clusters,
    // all fixed at shared boundaries: null embeddings drop at the vecs
    // parse (getSeq NPE in every ANN/knn/semantic collector), null
    // symbol/ts/price/qty trades drop at the ingest boundary (typed
    // per-symbol sweeps assert non-null closes), null payloads drop at
    // the stub decode (digest NPE).
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty").toString
    try {
      graft.tools.NullSweep.writeDirty(spark, Sf0001, dir)
      val fs = graft.tools.NullSweep.failures(spark, dir)
      assert(fs.isEmpty, "queries crashing on null-dirtied rows:\n" +
        fs.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally graft.tools.NullSweep.deleteRecursively(dir)
  }

  test("every registry query tolerates a singleton corpus") {
    // one row per table: the n=1 edge where sample-variance and lag
    // denominators hit zero — ANSI mode turns those into crashes
    // (volume_anomaly's n-1 division was the r11 singleton finding)
    val dir = java.nio.file.Files.createTempDirectory("graft_one").toString
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$Sf0001/$t.parquet").limit(1)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      val fs = graft.tools.EmptySweep.failures(spark, dir)
      assert(fs.isEmpty, "queries crashing on a singleton corpus:\n" +
        fs.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally graft.tools.NullSweep.deleteRecursively(dir)
  }
}
