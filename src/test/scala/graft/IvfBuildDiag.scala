package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Stage attribution for ivf_index_build (r11 verdict ask #5: 2.12 →
  * 3.48 s at sf0.1) — run with
  *   sbt "Test/runMain graft.IvfBuildDiag <sfDir>"
  */
object IvfBuildDiag {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfdiag] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val path = queries.IndexOps.indexDir(sfDir)
    val (cents, assigned) = t("kmeansCells (cold)")(queries.VecOps.kmeansCells(spark, sfDir))
    t("kmeans materialize")(assigned.count())
    t("centroids write")(cents.write.mode(SaveMode.Overwrite)
      .parquet(s"$path/ivf_centroids.parquet"))
    t("cells write")(assigned.repartition(col("c_id")).write.partitionBy("c_id")
      .mode(SaveMode.Overwrite).parquet(s"$path/ivf_cells.parquet"))
    t("metaStats")(queries.IvfIndex.writeMetaStats(spark, path))
    t("summary read-back") {
      val cells = spark.read.parquet(s"$path/ivf_cells.parquet")
      cells.groupBy($"c_id").agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(spark.read.parquet(s"$path/ivf_centroids.parquet")
          .agg(count(lit(1)).as("n_cells"))))
        .orderBy($"c_id").count()
    }
    t("full entry (2nd run, warm quantizer)") {
      SparkEntry.queries("ivf_index_build")(spark, sfDir).count()
    }
    spark.stop()
  }
}
