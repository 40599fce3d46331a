package graft

/** Dump `.explain("formatted")` for named declared queries (or `all`)
  * to one file per query — the plan-evidence artifact the optimization
  * rounds commit under plans/r<N>/. Mirrors the Bench session config
  * (master local[$SPARK_GRAFT_CPUS], shuffle.partitions=$cpus, UTC,
  * nanosAsLong, In-pushdown ceiling) so the dumped initial plan is the
  * one the bench's queries start from (AQE finalizes at runtime; the
  * Exchange count / join strategy / PushedFilters story this captures
  * is the static-plan contract). Warms the shared frames + persisted
  * indexes first, exactly like Bench's setup steps, so plan
  * construction (which for the index probes reads persisted artifacts
  * and for the guarded broadcasts runs the stats action) sees the same
  * warm lake the bench does.
  *
  * Usage: Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> [query...]
  *        (no query names = every declared query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // explicit arity check (ADVICE r17): a bare pattern-match threw an
    // opaque MatchError on missing args
    if (args.length < 3) {
      System.err.println(
        "usage: Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> [query...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, rest @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2": session dials for a dump run
    // (e.g. spark.graft.lake.factLayout.enabled=false to dump the
    // raw-scan shape of a layout consumer) — same contract as
    // ShuffleDiag's
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => System.err.println(s"[plandump] ignoring malformed conf token '$kv'")
        }
      }
    val spark = builder.getOrCreate()
    try {
    spark.sparkContext.setLogLevel("WARN")
    queries.TextOps.warmSharedFrames(spark, sfDir)
    queries.TextOps.warmDedupClusters(spark, sfDir)
    queries.PipelineOps.warmCleanCorpus(spark, sfDir)
    queries.IndexOps.warmPersistedIndexes(spark, sfDir)
    val names =
      if (rest.nonEmpty) rest
      else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val out = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $out")
      } catch {
        case scala.util.control.NonFatal(e) =>
          // plan-build failures must be visible in the artifact, not
          // silently absent files
          java.nio.file.Files.write(out,
            s"PLAN BUILD FAILED: $e".getBytes("UTF-8"))
          println(s"[plandump] FAILED $n: $e")
      }
    }
    // stop in finally (ADVICE r17): a warm-up failure must not leave
    // the session running with no per-query artifacts written
    } finally spark.stop()
  }
}
