package graft

/** Dev scratch for AnnTopKRule: exact plan vs rewritten plan + results.
  *   sbt "Test/runMain graft.AnnScratch /root/testdata/sf0.001"
  */
object AnnScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    graft.queries.IvfIndex.ensureIvfIndex(spark, dir)
    val q = spark.read.parquet(dir + "/embeddings.parquet")
      .selectExpr("cast(embedding as array<double>) as e")
      .limit(1).collect().head.getSeq[Double](0)
    graft.plans.AnnTopKRule.install(spark)

    val exact = graft.plans.AnnTopK.cosineTopK(spark, dir, q, 5)
    println("=== exact plan (conf off) ===")
    println(exact.queryExecution.optimizedPlan.treeString.take(400))
    val exactRows = exact.collect().toSeq
    println("exact: " + exactRows.mkString(" "))

    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val ann = graft.plans.AnnTopK.cosineTopK(spark, dir, q, 5)
      println("=== rewritten plan (conf on) ===")
      println(ann.queryExecution.optimizedPlan.treeString.take(1500))
      val annRows = ann.collect().toSeq
      println("ann:   " + annRows.mkString(" "))
      println("TOP1_MATCH=" + (annRows.headOption == exactRows.headOption))
    } finally spark.conf.set("spark.graft.ann.rewrite", "false")
    spark.stop()
  }
}
