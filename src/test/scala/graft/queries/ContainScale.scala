package graft.queries

import org.apache.spark.sql.functions._

/** One-off: prefix-candidate mass split into intra-copy vs cross-copy
  * (ScaleGen copies live at doc_id DIV 1e7) at a scale point.
  * Usage: Test/runMain graft.queries.ContainScale <dir>
  */
object ContainScale {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32)
      .select($"doc_id", call_function("shingles64", $"text").as("sh"))
    val sets = docs.groupBy($"sh")
      .agg(min($"doc_id").as("sid")).withColumn("nt", size($"sh"))
      .localCheckpoint()
    val post = sets.select($"sid", $"nt", explode($"sh").as("tid"))
    val dfreq = post.groupBy($"tid").agg(count(lit(1)).as("df"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy($"sid").orderBy($"df", $"tid")
    val prefix = post.join(dfreq.filter($"df" <= 64), "tid")
      .withColumn("rn", row_number().over(wr))
      .filter($"rn" <= expr("nt div 10") + 1)
      .select($"sid".as("sa"), $"tid")
    val cand = prefix.join(post.select($"sid".as("sb"), $"tid"), "tid")
      .filter($"sa" =!= $"sb")
      .select(least($"sa", $"sb").as("s1"), greatest($"sa", $"sb").as("s2"))
      .distinct()
      .withColumn("cross", expr("s1 DIV 10000000 <> s2 DIV 10000000"))
    cand.groupBy($"cross").count().orderBy($"cross").collect()
      .foreach(r => println(s"[cscale] $dir cross=${r.get(0)} n=${r.get(1)}"))
    spark.stop()
  }
}
