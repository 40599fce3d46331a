package graft

/** Dumps the cross-source gram aggregate's OWN formatted plan (the
  * entry's localCheckpoint truncates it out of the entry-level dump):
  * `_sets` = the r17 sorted-set form (kept as the > 63-source
  * fallback), `_mask` = the r18 bit_or bitmask form — the committed
  * evidence for the codegen-restoration claim.
  *
  * Usage: Test/runMain graft.CrossSourceDump <sfDir> <outDir>
  */
object CrossSourceDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      for ((name, df) <- Seq(
          "crosssource_agg_sets" -> queries.TextOps.crossSourceAggSets(spark, sfDir),
          "crosssource_agg_mask" -> queries.TextOps.crossSourceAgg(spark, sfDir))) {
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val out = java.nio.file.Paths.get(outDir, s"$name.txt")
        java.nio.file.Files.write(out, p.getBytes("UTF-8"))
        println(s"[crossdump] wrote $out")
        // warm + min-of-3 wall, bench protocol: the A/B the bit_or
        // trade-off claim rests on
        df.count()
        val secs = Seq.fill(3) {
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }
        println(f"[crossdump] $name min=${secs.min}%.3f s (3 warm runs: ${secs.map(x => f"$x%.3f").mkString(", ")})")
      }
    } finally spark.stop()
  }
}
