package graft.queries

/** Dev scratch: time each shared-frame build separately (sequentially,
  * cold caches) to see what dominates the bench's setup_shared_frames
  * line. Run: sbt "Test/runMain graft.queries.SetupScratch /root/testdata/sf0.1"
  */
object SetupScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[setup] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    t("docTokens") { TextOps.docTokens(spark, dir).count() }
    t("termFreq") { TextOps.termFreq(spark, dir).count() }
    t("wordGrams") { TextOps.wordGrams(spark, dir).count() }
    t("signatureTable") { TextOps.signatureTableCached(spark, dir).count() }
    t("bandedSigs") { VecOps.bandedSigs(spark, dir).count() }
    t("kmeansCells") { VecOps.kmeansCells(spark, dir)._2.count() }
    t("warmSharedFrames2nd") { TextOps.warmSharedFrames(spark, dir) }
    spark.stop()
  }
}
