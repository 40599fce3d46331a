package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Dev diagnostic for text_ngram_jaccard's stage costs — run with
  *   sbt "Test/runMain graft.JaccardDiag <sfDir>"
  * Reproduces the entry's stages (prefix build, candidate join,
  * distinct, verify, expansion) with separate timers and counts, so
  * "candidate mass" vs "verify intersects" vs "pair expansion" costs
  * can be attributed before touching the declared plan.
  */
object JaccardDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    TextOps.warmSharedFrames(spark, sfDir)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jacdiag] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val sets = TextOps.signatureTableCached(spark, sfDir)
      .select($"sid", $"ids", $"tids").withColumn("nt", size($"tids")).persist()
    timed("sets")(println(s"[jacdiag] sets=${sets.count()}"))
    val t = sets.select($"sid", $"nt", explode($"tids").as("tid"))
    val dfreq = t.groupBy($"tid").agg(count("*").as("df"))
    val prefLen = $"nt" - (($"nt" * 4 + lit(4)) / lit(5)).cast("int") + lit(1)
    val prefix = t.join(broadcast(dfreq), "tid")
      .groupBy($"sid", $"nt")
      .agg(array_sort(collect_list(struct($"df", $"tid"))).as("terms"))
      .select($"sid", $"nt",
        posexplode(slice($"terms", lit(1), prefLen)).as(Seq("rk0", "term")))
      .select($"term.tid".as("tid"), $"sid", $"nt", ($"rk0" + 1).as("rk"))
      .persist()
    timed("prefix_build")(println(s"[jacdiag] prefix_rows=${prefix.count()}"))
    val idxLen = $"nt" - (($"nt" * 8 + lit(8)) / lit(9)).cast("int") + lit(1)
    val idxPrefix = prefix.filter($"rk" <= idxLen)
    println(s"[jacdiag] idx_prefix_rows=${idxPrefix.count()}")
    val rawCand = idxPrefix.as("a").join(prefix.as("b"),
      $"a.tid" === $"b.tid" &&
        ($"a.nt" < $"b.nt" || ($"a.nt" === $"b.nt" && $"a.sid" < $"b.sid")) &&
        $"b.nt" * 4 <= $"a.nt" * 5 &&
        (lit(1) + least($"a.nt" - $"a.rk", $"b.nt" - $"b.rk")) * 9 >=
          ($"a.nt" + $"b.nt") * 4)
      .select($"a.sid".as("s1"), $"b.sid".as("s2"))
    timed("cand_join")(println(s"[jacdiag] raw_cand=${rawCand.count()}"))
    val cand = rawCand.distinct().persist()
    timed("cand_distinct")(println(s"[jacdiag] cand=${cand.count()}"))
    val sA = sets.select($"sid".as("s1"), $"tids".as("t1"), $"nt".as("n1"))
    val sB = sets.select($"sid".as("s2"), $"tids".as("t2"), $"nt".as("n2"))
    val inter = call_function("sorted_long_intersect_size", $"t1", $"t2")
    val jac = inter.cast("double") / ($"n1" + $"n2" - inter)
    val verified = cand.join(broadcast(sA), "s1").join(broadcast(sB), "s2")
      .filter(lit(9) * least($"n1", $"n2") >= lit(4) * ($"n1" + $"n2") &&
        lit(9) * inter >= lit(4) * ($"n1" + $"n2"))
      .select($"s1", $"s2", round(jac, 4).as("jaccard")).persist()
    timed("verify")(println(s"[jacdiag] verified=${verified.count()}"))
    val full = SparkEntry.queries("text_ngram_jaccard")(spark, sfDir)
    timed("full_entry")(println(s"[jacdiag] out=${full.count()}"))
    timed("full_entry_2")(println(s"[jacdiag] out=${full.count()}"))
    spark.stop()
  }
}
