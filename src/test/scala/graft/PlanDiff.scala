package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage shuffle-record attribution across scale points — names the
  * stage (callsite) so a super-linear exchange can be localized.
  * Usage: Test/runMain graft.PlanDiff <query> <dir> [dir...]
  */
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.recordsWritten > 0)
          stages.synchronized {
            stages += ((sc.stageInfo.name.take(60),
              m.shuffleWriteMetrics.recordsWritten,
              m.shuffleWriteMetrics.bytesWritten))
          }
      }
    })
    for (dir <- args.tail) {
      stages.synchronized(stages.clear())
      SparkEntry.queries(args.head)(spark, dir).count()
      Thread.sleep(800)
      println(s"[plandiff] === $dir")
      stages.synchronized(stages.sortBy(-_._2)).take(12).foreach { case (n, r, b) =>
        println(f"[plandiff] recs=$r%10d MB=${b / 1e6}%8.2f  $n")
      }
    }
    spark.stop()
  }
}
