package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    queries.IndexOps.warmPersistedIndexes(spark, sfDir)
    def t(name: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROF $name%-28s ${runs.map(r => f"$r%.3f").mkString(" ")}")
    }
    val path = queries.IndexOps.indexDir(sfDir)
    t("ivf:ensure") { queries.IvfIndex.ensureIvfIndex(spark, sfDir) }
    t("ivf:cents-read") { spark.read.parquet(s"$path/ivf_centroids.parquet").count() }
    t("ivf:query-row") { Core.load(spark, sfDir, "embeddings").filter($"vec_id" === 0).count() }
    t("ivf:cells-8part") {
      spark.read.parquet(s"$path/ivf_cells.parquet").filter($"c_id".isin(0L,1L,2L,3L,4L,5L,6L,7L)).count()
    }
    for (q <- Seq("ivf_index_probe", "hybrid_search_rrf", "text_bm25"))
      t(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    spark.stop()
  }
}
