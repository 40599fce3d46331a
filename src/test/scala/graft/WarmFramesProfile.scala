package graft.queries

/** Dev profiler — per-frame attribution of the bench's
  * setup_shared_frames line (session-memo builds on a warm lake):
  *   sbt "Test/runMain graft.queries.WarmFramesProfile <sfDir>"
  * Times each memoized build SEQUENTIALLY (so the numbers are each
  * frame's own cost, unlike the overlapped setup line) after a warmup
  * scan absorbs JVM/codegen startup.
  */
object WarmFramesProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[frames] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    phase("warmup_scan") { spark.read.parquet(s"$sfDir/documents.parquet").count(); () }
    phase("docTokens") { TextOps.docTokens(spark, sfDir).count(); () }
    phase("termFreq") { TextOps.termFreq(spark, sfDir).count(); () }
    phase("wordGrams") { TextOps.wordGrams(spark, sfDir).count(); () }
    phase("signatureTable") { TextOps.signatureTableCached(spark, sfDir).count(); () }
    phase("verifiedPairs") { TextOps.coldPhases(spark, sfDir)(2)._2() }
    phase("bandedSigs") { VecOps.bandedSigsIndex(spark, sfDir).count(); () }
    phase("kmeansCells") { VecOps.kmeansCells(spark, sfDir)._2.count(); () }
    spark.stop()
  }
}
