package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Anti-scaling diagnosis (r17 verdict ask #1): entries like
  * join_scd2_pointintime run 10× SLOWER at local[32] than local[8] on
  * tiny record counts — a per-task/per-job constant multiplying with
  * partition count. ShuffleDiag attributes records; this diag attributes
  * WALL, per job: for each Spark job an entry triggers it prints the
  * job's wall, its stage/task counts, the sum of task run time (the
  * "real work"), and the driver-side GAP since the previous job ended —
  * so "many tiny jobs", "few jobs with huge task-launch overhead" and
  * "driver-side planning between jobs" separate cleanly.
  *
  * Usage: sbt "Test/runMain graft.ScaleDiag <sfDir> <query> [query...]"
  *        (core count from SPARK_GRAFT_CPUS, default 32; run twice —
  *         8 vs 32 — and diff the job tables)
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => System.err.println(s"[diag] ignoring malformed conf token '$kv'")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    queries.TextOps.warmDedupClusters(spark, sfDir)
    queries.TextOps.warmSharedFrames(spark, sfDir)
    queries.PipelineOps.warmCleanCorpus(spark, sfDir)
    queries.IndexOps.warmPersistedIndexes(spark, sfDir)

    case class Job(id: Int, t0: Long) {
      var t1 = 0L
      var stages = 0
      var tasks = 0L
      var taskRunMs = 0L   // sum of executorRunTime over completed stages
      var taskCpuMs = 0L
      var desc = ""
    }
    val live = mutable.Map[Int, Job]()
    val doneJobs = mutable.ArrayBuffer[Job]()
    val stageToJob = mutable.Map[Int, Job]()
    val lastEvent = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val job = Job(j.jobId, System.nanoTime())
        job.desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties).flatMap(p =>
            Option(p.getProperty("callSite.short")))).getOrElse("")
        live(j.jobId) = job
        j.stageIds.foreach(sid => stageToJob(sid) = job)
        lastEvent.set(System.nanoTime())
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        stageToJob.get(sc.stageInfo.stageId).foreach { job =>
          job.stages += 1
          job.tasks += sc.stageInfo.numTasks
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            job.taskRunMs += m.executorRunTime
            job.taskCpuMs += m.executorCpuTime / 1000000L
          }
        }
        lastEvent.set(System.nanoTime())
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        live.remove(e.jobId).foreach { j => j.t1 = System.nanoTime(); doneJobs += j }
        lastEvent.set(System.nanoTime())
      }
    })
    def drain(): Unit =
      while ((System.nanoTime() - lastEvent.get()) < 400L * 1000 * 1000)
        Thread.sleep(50)

    for (n <- names) {
      // one untimed warm run absorbs JIT/codegen so the measured run is
      // steady-state (same protocol as the bench's min-of-two)
      SparkEntry.queries(n)(spark, sfDir).count()
      drain()
      synchronized { doneJobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val js = synchronized(doneJobs.sortBy(_.t0).toVector)
      println(f"[scale] === $n cpus=$cpus wall=$wall%7.3f s jobs=${js.size}")
      var prevEnd = t0
      var gapTot = 0.0
      var jobTot = 0.0
      js.foreach { j =>
        val gap = math.max(0L, j.t0 - prevEnd) / 1e9
        val dur = (j.t1 - j.t0) / 1e9
        gapTot += gap; jobTot += dur
        prevEnd = math.max(prevEnd, j.t1)
        println(f"[scale] job=${j.id}%4d gap=$gap%6.3f dur=$dur%7.3f stages=${j.stages}%3d " +
          f"tasks=${j.tasks}%5d taskRun=${j.taskRunMs}%6d ms cpu=${j.taskCpuMs}%6d ms  ${j.desc.take(70)}")
      }
      val tailGap = math.max(0L, System.nanoTime() - prevEnd) / 1e9
      println(f"[scale] --- $n: jobWall=$jobTot%7.3f gapWall=${gapTot + tailGap}%7.3f " +
        f"(of total $wall%7.3f)")
    }
    spark.stop()
  }
}
