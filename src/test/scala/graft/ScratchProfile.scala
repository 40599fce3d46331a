package graft

/** Dev profiler (not a test suite) — run with
  *   sbt "Test/runMain graft.ScratchProfile <sfDir> <query> [query...]"
  * Times each named SparkEntry query twice (min-of-two, the bench
  * convention) after warming the shared frames AND the persisted lake
  * indexes, so every number is the warm serving marginal. This is also
  * the SCALE.md measured-exponents protocol: generate a 10× corpus
  * with ScaleGen, run the same query list against both dirs, compare.
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // serving conf for the index probes' In-pushdown (see Bench)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    queries.TextOps.warmDedupClusters(spark, sfDir)
    queries.TextOps.warmSharedFrames(spark, sfDir)
    queries.PipelineOps.warmCleanCorpus(spark, sfDir)
    queries.IndexOps.warmPersistedIndexes(spark, sfDir)
    for (n <- names) {
      val q = SparkEntry.queries(n)
      var plan: org.apache.spark.sql.DataFrame = null
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        plan = q(spark, sfDir)
        val c = plan.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $n%-28s $sec%7.3f s  rows=$c")
        sec
      }
      println(f"[scratch] $n MIN ${ts.min}%7.3f s")
    }
    spark.stop()
  }
}
