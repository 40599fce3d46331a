package graft.queries

import org.apache.spark.sql.functions._

/** One-off candidate-mass diagnosis for text_dedup_containment:
  *   sbt "Test/runMain graft.queries.ContainDiag <sfDir>"
  */
object ContainDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(s)
    val docs = graft.Core.load(s, dir, "documents")
      .repartition(8)
      .select(col("doc_id"), call_function("shingles64", col("text")).as("sh"))
    val sets = docs.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("sid"), collect_list(col("doc_id")).as("ids"))
      .withColumn("nt", size(col("sh")))
      .withColumnRenamed("sh", "tids")
      .localCheckpoint()
    println("SETS=" + sets.count())
    val post = sets.select(col("sid"), col("nt"), explode(col("tids")).as("tid"))
    println("POST=" + post.count())
    val dfreq = post.groupBy(col("tid")).agg(count(lit(1)).as("df"))
    println("VOCAB=" + dfreq.count())
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sid")).orderBy(col("df"), col("tid"))
    val prefix = post.join(broadcast(dfreq), "tid")
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= expr("nt div 10") + 1 && col("df") <= 64)
      .select(col("sid").as("sa"), col("tid"))
    println("PREFIX=" + prefix.count())
    val cand = prefix.join(post.select(col("sid").as("sb"), col("tid")), Seq("tid"))
      .filter(col("sa") =!= col("sb")).select(col("sa"), col("sb"))
    println("CAND=" + cand.count())
    println("CANDD=" + cand.distinct().count())
    val banded = sets.select(col("sid"),
      posexplode(TextOps.bandHashes(call_function("minhash64", col("tids")))).as(Seq("band", "bh")))
    val bandCand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("s1"), col("y.sid").as("s2"))
    println("BANDCAND=" + bandCand.count())
    println("BANDCANDD=" + bandCand.distinct().count())
    s.stop()
  }
}
