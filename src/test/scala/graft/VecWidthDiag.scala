package graft

/** SCALE.md harness for the r14-ask-#1 corpus-sized vec-index width:
  * reports, for a fixture dir, the dialed band width the build froze
  * into the artifact, the direct CANDIDATE MASS of the incremental
  * probe (distinct (b_id, vec_id) pairs — the quantity whose ~17%-of-
  * corpus-per-batch-vector blowup at frozen w=16 was the documented
  * cliff), and the per-batch-vector ring pull as a corpus fraction.
  * Candidate mass is a plan property (exact, box-noise-immune) — the
  * claim of record for the width dial.
  *
  *   sbt "Test/runMain graft.VecWidthDiag <sfDir> [sfDir...]"
  */
object VecWidthDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (dir <- args) {
      val n = queries.VecOps.vecCorpusN(spark, dir)
      val w = queries.VecOps.vecIndexBandBits(n)
      val (path, rebuilt) = queries.IndexOps.ensureVecIndexStatus(spark, dir)
      val stored = queries.IndexOps.readVecW(path)
      // the incremental entry's candidate stage, re-derived standalone:
      // batch = vec_id % 10 == 7, wide Hamming-≤3 probe at the STORED w
      graft.functions.VectorExprs.register(spark)
      val batch = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(pmod($"vec_id", lit(10)) === 7)
        .select($"vec_id".as("b_id"), $"embedding".cast("array<double>").as("b_emb"))
        .withColumn("b_n", sqrt(call_function("dotp", $"b_emb", $"b_emb")))
        .filter($"b_n" > 0)
        .withColumn("bands", queries.VecOps.lshBandKeysW($"b_emb", stored))
        .localCheckpoint()
      val nb = batch.count()
      val qb = batch.select($"b_id", posexplode($"bands").as(Seq("band", "bk")))
        .select($"b_id", $"band",
          explode(queries.VecOps.probeKeysWideW($"bk", stored)).as("bk"))
      val t0 = System.nanoTime()
      val cands = spark.read.parquet(s"$path/vec_bands.parquet")
        .join(qb, Seq("band", "bk"))
        .filter($"vec_id" =!= $"b_id")
        .select($"b_id", $"vec_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val perVec = if (nb == 0) 0.0 else cands.toDouble / nb
      println(f"[vecwidth] $dir n=$n%7d dialW=$w storedW=$stored rebuilt=$rebuilt " +
        f"batch=$nb%6d candidates=$cands%10d perVec=$perVec%9.1f " +
        f"corpusFrac=${100.0 * perVec / n}%6.2f%% candSec=$sec%6.2f")
    }
    spark.stop()
  }
}
