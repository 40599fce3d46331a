package graft

import org.apache.spark.sql.functions._

/** Planted-skew measurement for the basket cap (r12 verdict ask #6):
  * union ONE synthetic bot user (N distinct items — the quadratic
  * pathology the cap exists for) onto a real corpus's basket frame and
  * time the assoc_rules pair-join shape capped vs uncapped, through
  * the SAME capBaskets code path the entries use.
  * Usage: Test/runMain graft.BasketCapDiag <sfDir> [botItems] [cap]
  */
object BasketCapDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val botItems = if (args.length > 1) args(1).toInt else 12000
    val cap = if (args.length > 2) args(2).toInt else 256
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
    val bot = spark.range(botItems)
      .select(lit(99999999L).as("user_id"), $"id".as("item"))
      // spread the planted basket: a real bot's rows arrive across the
      // cluster, not in one parquet row group
      .repartition(cpus.toInt)
    val e = queries.GraphOps.baskets(spark, sfDir).unionByName(bot)
      .localCheckpoint()
    for (c <- Seq(cap, 0)) {
      spark.conf.set("spark.graft.graph.basketCap", c.toString)
      val t0 = System.nanoTime()
      val capped = queries.GraphOps.capBaskets(spark, e)
      val pairs = capped.as("a").join(capped.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("n_both"))
        .count()
      println(f"[basketcap] cap=$c%-6d bot=$botItems pair-agg rows=$pairs " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.conf.unset("spark.graft.graph.basketCap")
    }
    spark.stop()
  }
}
