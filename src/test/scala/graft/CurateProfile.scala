package graft.queries

import org.apache.spark.sql.functions._

/** Dev profiler (not a test suite) — stage-level attribution for the
  * composition entries: times each internal stage of curate_corpus_e2e
  * cumulatively (warm shared frames, min-of-two) so a regression can be
  * pinned to a stage instead of read off the composed total.
  *   sbt "Test/runMain graft.queries.CurateProfile <sfDir>"
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    TextOps.warmDedupClusters(spark, sfDir)
    TextOps.warmSharedFrames(spark, sfDir)
    PipelineOps.warmCleanCorpus(spark, sfDir)

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val c = mk.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, c)
      }
      println(f"[curate] $name%-22s ${ts.map(_._1).min}%7.3f s  rows=${ts.head._2}")
    }

    val s = spark; val dir = sfDir
    val docs = TextOps.docTokens(s, dir)
    val keepers = TextOps.clusterLabels(s, dir)
      .filter($"doc_id" === $"label").select($"doc_id")
    val grams = TextOps.wordGrams(s, dir)
    val bench = grams.filter($"doc_id" % 97 === 3).select($"gram").distinct()
    val bad = grams.filter($"doc_id" % 97 =!= 3)
      .join(broadcast(bench), "gram").select($"doc_id").distinct()
    val clean = docs.filter($"doc_id" % 97 =!= 3)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(bad, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"source", size($"toks").cast("long").as("n_tokens"))

    t("keepers")(keepers)
    t("bench_grams")(bench)
    t("bad")(bad)
    t("clean")(clean)

    val tf = clean.groupBy($"source").agg(sum($"n_tokens").as("n_tokens"))
    val g = tf.agg(sum($"n_tokens").as("total"), count(lit(1)).as("ns"))
    val w = tf.crossJoin(broadcast(g))
      .select($"source",
        least(lit(1.0), round($"total" * lit(1.0) / ($"ns" * $"n_tokens"), 4)).as("p"))
    val h1 = ($"doc_id" % lit(1000000007L)) * lit(2654435761L) % lit(1000000007L)
    val kept = clean.join(broadcast(w), "source")
      .filter(h1 * lit(2654435761L) % lit(1000000007L) % lit(1000000L) < $"p" * lit(1000000L))
      .select($"doc_id", $"source", $"n_tokens")
    t("kept")(kept)

    import org.apache.spark.sql.expressions.Window
    val tb = kept.withColumn("bucket", expr("doc_id DIV 1000"))
    val boff = tb.groupBy($"bucket").agg(sum($"n_tokens").as("btot"))
      .withColumn("boff", coalesce(sum($"btot").over(
        Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"boff")
    val win = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t("full")(
      tb.join(broadcast(boff), "bucket")
        .withColumn("tok_offset", $"boff" + coalesce(sum($"n_tokens").over(win), lit(0L)))
        .select($"doc_id", $"source", $"n_tokens", $"tok_offset")
        .orderBy($"doc_id"))

    t("entry")(graft.SparkEntry.queries("curate_corpus_e2e")(spark, sfDir))
    t("report")(graft.SparkEntry.queries("pipeline_report")(spark, sfDir))

    // Variant: exchange-reuse barriers — repartition the shared
    // subtrees so both consumer branches read ONE materialized shuffle.
    val cleanB = clean.repartition($"doc_id")
    val tfB = cleanB.groupBy($"source").agg(sum($"n_tokens").as("n_tokens"))
    val gB = tfB.agg(sum($"n_tokens").as("total"), count(lit(1)).as("ns"))
    val wB = tfB.crossJoin(broadcast(gB))
      .select($"source",
        least(lit(1.0), round($"total" * lit(1.0) / ($"ns" * $"n_tokens"), 4)).as("p"))
    val keptB = cleanB.join(broadcast(wB), "source")
      .filter(h1 * lit(2654435761L) % lit(1000000007L) % lit(1000000L) < $"p" * lit(1000000L))
      .select($"doc_id", $"source", $"n_tokens")
    val tbB = keptB.withColumn("bucket", expr("doc_id DIV 1000")).repartition($"bucket")
    val boffB = tbB.groupBy($"bucket").agg(sum($"n_tokens").as("btot"))
      .withColumn("boff", coalesce(sum($"btot").over(
        Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"boff")
    val fullB = tbB.join(broadcast(boffB), "bucket")
      .withColumn("tok_offset", $"boff" + coalesce(sum($"n_tokens").over(win), lit(0L)))
      .select($"doc_id", $"source", $"n_tokens", $"tok_offset")
      .orderBy($"doc_id")
    t("keptB")(keptB)
    t("fullB")(fullB)
    println("[curate] fullB reused exchanges: " +
      fullB.queryExecution.executedPlan.toString.count(_ => false) +
      fullB.queryExecution.executedPlan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
      }.size)
    spark.stop()
  }
}
