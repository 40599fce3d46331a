package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted fat-partition measurement for the two-level bucket
  * prefix-sum (r13 verdict ask #1): build ONE synthetic group with N
  * near-unique values — the single-task-sort pathology the device
  * exists for (a fat returnflag in agg_weighted_median, a fat source
  * in agg_gini) — and time the cumulative-weight crossing query in
  * both shapes over the SAME frame: the old single per-group window
  * (whole group sorts through one task regardless of parallelism) vs
  * the wired 16-bucket two-level form (per-(group,bucket) windows +
  * the tiny bucket-totals prefix).
  * Usage: Test/runMain graft.RankBucketDiag [nRows]
  */
object RankBucketDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // one group, pseudo-shuffled near-unique values, unit weights —
    // materialized once so both shapes time pure window work
    val g = spark.range(n).select(
        lit("F").as("flag"),
        (($"id" * 1103515245L + 12345L) % (4L * n)).cast("double").as("p"),
        lit(1L).as("w"))
      .repartition(cpus.toInt).localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[rankbucket] $label%-12s n=$n rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // OLD: one window per group — the whole group is ONE sort task
    time("single-win") {
      val wc = Window.partitionBy($"flag").orderBy($"p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy($"flag")
      g.withColumn("cw", sum($"w").over(wc))
        .withColumn("tw", sum($"w").over(wt))
        .filter($"cw" * 2 >= $"tw")
        .groupBy($"flag").agg(min($"p")).count()
    }
    // NEW: the entry's wired shape — 16 range buckets, per-(group,
    // bucket) windows, prefix offsets over the group×16 totals
    time("bucketed") {
      val bounds = g.agg(percentile_approx($"p",
        typedLit((1 to 15).map(_ / 16.0)), lit(10000)).as("bs"))
      val bucketed = g.crossJoin(broadcast(bounds))
        .select($"flag", $"p", $"w",
          aggregate($"bs", lit(0),
            (acc, b) => acc + when($"p" > b, 1).otherwise(0)).as("bkt"))
      val wOff = Window.partitionBy($"flag").orderBy($"bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy($"flag")
      val offs = bucketed.groupBy($"flag", $"bkt").agg(sum($"w").as("bw"))
        .withColumn("off", coalesce(sum($"bw").over(wOff), lit(0L)))
        .withColumn("tw", sum($"bw").over(wTot))
        .select($"flag", $"bkt", $"off", $"tw")
      val wIn = Window.partitionBy($"flag", $"bkt").orderBy($"p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(offs), Seq("flag", "bkt"))
        .withColumn("cw", sum($"w").over(wIn) + $"off")
        .filter($"cw" * 2 >= $"tw")
        .groupBy($"flag").agg(min($"p")).count()
    }
    spark.stop()
  }
}
