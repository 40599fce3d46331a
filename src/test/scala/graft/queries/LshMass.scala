package graft.queries

import org.apache.spark.sql.functions._

/** One-off: measured band-bucket collision mass vs the analytic dial's
  * random-pair assumption. Usage: Test/runMain graft.queries.LshMass <dir>
  */
object LshMass {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val e = VecOps.emb(spark, dir)
    val n = e.count()
    val wAnalytic = VecOps.lshBandBits(n)
    for (w <- Seq(wAnalytic, wAnalytic + 2, wAnalytic + 4, 28).distinct if w <= 28) {
      val sigd = VecOps.bandedSigsW(spark, dir, w)
      val mass = sigd.groupBy($"band", $"bk").agg(count(lit(1)).as("c"))
        .agg(sum($"c" * ($"c" - 1) / 2).as("pairs")).head().getAs[Any]("pairs")
      val probes = n * 4 * (1 + w + w.toLong * (w - 1) / 2)
      println(s"[lshmass] $dir n=$n w=$w bucketPairMass=$mass probeRows=$probes")
    }
    spark.stop()
  }
}
