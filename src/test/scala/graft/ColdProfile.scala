package graft

/** Dev profiler for the COLD dedup-clusters build — run with
  *   sbt "Test/runMain graft.ColdProfile <sfDir>"
  * where <sfDir> should be a SYMLINK to a real sf dir (a fresh lake key,
  * so the persisted labels artifact is cold without touching the real
  * one). Times each phase of what the bench's setup_dedup_clusters line
  * pays on a cold lake, in dependency order, so the increments are
  * attributable: tokenize → signature table → verified pair graph →
  * label propagation + persist.
  */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[cold] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // absorb session startup (first-job broadcast, codegen, footer
    // reads) so the phase lines measure the work, not the JVM
    phase("warmup_scan") { spark.read.parquet(s"$sfDir/documents.parquet").count(); () }
    for ((name, f) <- queries.TextOps.coldPhases(spark, sfDir)) phase(name)(f())
    spark.stop()
  }
}
