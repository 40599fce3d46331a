package graft

/** Interleaved same-JVM A/B of text_dedup_embed_ann's two verify
  * shapes (r18): A = ids-only candidate join + guarded broadcast
  * vector attach (default dials), B = arrays-ride-the-cell-join
  * fallback (forced via spark.graft.broadcast.maxRows=0 — the guard
  * reads the session conf per invocation, so the toggle is live).
  * Interleaving + min-of-3 removes the box's run-to-run wall noise
  * from the comparison.
  *
  * Usage: Test/runMain graft.EmbedAbDiag <sfDir>
  */
object EmbedAbDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val defRows = spark.conf.get("spark.graft.broadcast.maxRows", "4000000")
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries("text_dedup_embed_ann")(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // warm: caches + JIT for both code paths
      spark.conf.set("spark.graft.broadcast.maxRows", "0"); run()
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to 3) {
        spark.conf.set("spark.graft.broadcast.maxRows", defRows)
        a += run()
        spark.conf.set("spark.graft.broadcast.maxRows", "0")
        b += run()
      }
      println(f"[embedab] A broadcast-attach min=${a.min}%.3f runs=${a.map(x => f"$x%.3f").mkString(",")}")
      println(f"[embedab] B array-ride      min=${b.min}%.3f runs=${b.map(x => f"$x%.3f").mkString(",")}")
    } finally spark.stop()
  }
}
