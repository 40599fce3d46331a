package graft.queries

import org.apache.spark.sql.functions._

/** Dev stage attribution for text_dedup_containment (r13 verdict ask
  * #9: cache the banded exchange across consumers) — replicates the
  * entry's internal stages (the FuzzyDiag pattern) and times each
  * in isolation after a warm first run.
  * Usage: Test/runMain graft.ContainDiag <sfDir> [iters]
  */
object ContainDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[contain] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("text_dedup_containment")(spark, sfDir).count()
      println(f"[contain] full iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    // stage replication (mirrors the entry internals)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select($"doc_id", call_function("shingles64", $"text").as("sh"))
    val sets = t("sets checkpoint") {
      docs.groupBy($"sh")
        .agg(min($"doc_id").as("sid"), collect_list($"doc_id").as("ids"))
        .withColumn("nt", size($"sh"))
        .withColumn("bhs", TextOps.bandHashes(call_function("minhash64", $"sh")))
        .localCheckpoint()
    }
    val banded = sets
      .select($"sid", $"nt", $"sh", $"bhs", posexplode($"bhs").as(Seq("band", "bh")))
    val firstAgree = !exists(
      zip_with(slice($"x.bhs", lit(1), $"x.band"), slice($"y.bhs", lit(1), $"y.band"),
        (a, b) => a === b), p => p)
    val bandInter = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.bh" === $"y.bh" && $"x.sid" < $"y.sid" && firstAgree)
      .select($"x.sid".as("s1"), $"y.sid".as("s2"), $"x.nt".as("n1"), $"y.nt".as("n2"),
        call_function("sorted_long_intersect_size", $"x.sh", $"y.sh").as("inter"))
    t("bandInter count")(println("  pairs=" + bandInter.count()))
    t("bandInter count (warm)")(bandInter.count())
    val post = sets.select($"sid", $"nt", explode($"sh").as("tid"))
    val dfreq = post.groupBy($"tid").agg(count(lit(1)).as("df"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy($"sid").orderBy($"df", $"tid")
    val prefix = post.join(dfreq, "tid")
      .withColumn("rn", row_number().over(wr))
      .filter($"rn" <= expr("nt div 10") + 1 && $"df" <= 64)
      .select($"sid".as("sa"), $"tid")
    val prefCand = prefix.join(post.select($"sid".as("sb"), $"tid"), "tid")
      .filter($"sa" =!= $"sb")
      .select(least($"sa", $"sb").as("s1"), greatest($"sa", $"sb").as("s2"))
      .distinct()
    t("prefCand count")(println("  cands=" + prefCand.count()))
    t("prefCand count (warm)")(prefCand.count())
    val prefInter = prefCand
      .join(sets.select($"sid".as("s1"), $"sh".as("t1"), $"nt".as("n1"), $"bhs".as("bh1")), "s1")
      .join(sets.select($"sid".as("s2"), $"sh".as("t2"), $"nt".as("n2"), $"bhs".as("bh2")), "s2")
      .filter(!exists(zip_with($"bh1", $"bh2", (a, b) => a === b), p => p))
      .select($"s1", $"s2", $"n1", $"n2",
        call_function("sorted_long_intersect_size", $"t1", $"t2").as("inter"))
    t("prefInter count")(println("  pref=" + prefInter.count()))
    t("prefInter count (warm)")(prefInter.count())
    spark.stop()
  }
}
