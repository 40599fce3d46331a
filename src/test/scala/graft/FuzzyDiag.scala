package graft

/** Dev diagnostic for the join_fuzzy_levenshtein drift (r12 verdict ask
  * #4): run the entry N times in ONE session to split JIT/codegen
  * warm-up from steady-state plan cost, then time the two halves of the
  * plan (candidate generation without the DP residual vs the full
  * entry) to attribute where the seconds live.
  * Usage: Test/runMain graft.FuzzyDiag <sfDir> [iters]
  */
object FuzzyDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val iters = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("join_fuzzy_levenshtein")(spark, sfDir).count()
      println(f"[fuzzy] full iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    // candidate stream WITHOUT the levenshtein residual: same blocking,
    // salting, length short-circuit — isolates the DP cost
    val salts = 16
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), split(col("p_name"), " ")(0).as("blk"))
    val a = p.withColumn("salt", pmod(xxhash64(col("p_partkey")), lit(salts)))
      .repartition(128, col("blk"), col("salt"))
    val b = p.withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = a.as("a").join(b.as("b"),
          col("a.blk") === col("b.blk") && col("a.salt") === col("b.salt") &&
            col("a.p_partkey") < col("b.p_partkey") &&
            abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 3)
        .count()
      println(f"[fuzzy] candidates-only iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$c")
    }
    spark.stop()
  }
}
