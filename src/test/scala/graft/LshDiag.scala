package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the LSH k-NN join's candidate mass — run with
  *   sbt "Test/runMain graft.LshDiag <sfDir>"
  * Prints vectors, per-band bucket-occupancy skew, and the candidate
  * pair count the Hamming-≤2 multi-probe join generates. The 10×
  * scaling dry run flagged vec_knn_join_lsh as the one super-linear
  * entry; this separates "candidate blowup" (bucket skew / clustered
  * corpus — a config dial: more bits per band) from "fixed cost".
  */
object LshDiag {
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
    val nv = queries.VecOps.emb(spark, sfDir).count()
    val wBits = queries.VecOps.lshBandBits(nv)
    val sigd = queries.VecOps.bandedSigsW(spark, sfDir, wBits)
    val n = sigd.select($"vec_id").distinct().count()
    println(s"[lshdiag] vectors=$n wBits=$wBits")
    val occ = sigd.groupBy($"band", $"bk").count()
    occ.groupBy($"band").agg(
      count(lit(1)).as("buckets"),
      max($"count").as("max_occ"),
      expr("percentile_approx(count, 0.99)").as("p99_occ"),
      sum($"count" * ($"count" - 1) / 2).as("within_bucket_pairs"))
      .orderBy($"band")
      .collect().foreach(r => println(s"[lshdiag] band=${r.get(0)} buckets=${r.get(1)} max_occ=${r.get(2)} p99_occ=${r.get(3)} exact_pairs=${r.get(4)}"))
    val probes = sigd.select($"vec_id", $"band",
      explode(queries.VecOps.probeKeysW($"bk", wBits)).as("bk"))
    val cand = probes.as("x").join(sigd.as("y"),
        $"x.band" === $"y.band" && $"x.bk" === $"y.bk" && $"x.vec_id" =!= $"y.vec_id")
    println(s"[lshdiag] multiprobe_candidates=${cand.count()}")
    spark.stop()
  }
}
