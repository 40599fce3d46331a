package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Contention-immune cost attribution: wall clock on a shared/virtualized
  * box swings 5-10× run to run (the r13 driver bench episode), but the
  * WORK a plan does — jobs, stages, tasks, input bytes, shuffle
  * records/bytes — is a property of the plan, not the neighbour's load.
  * This diag runs named SparkEntry queries once (after the standard
  * warm) with a metrics listener attached and prints one line per entry:
  *
  *   [shuffle] <name> jobs=J stages=S tasks=T input=MB shufRecs=N shufMB=M sec=W
  *
  * Use it to compare a rewrite's cost structurally (e.g. "the gram
  * distinct now shuffles once, not 3×" shows up as a ~3× drop in
  * shuffle records) and to attribute round-over-round drift to added
  * work vs box noise. Usage:
  *   sbt "Test/runMain graft.ShuffleDiag <sfDir> <query> [query...]"
  */
object ShuffleDiag {
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
    // SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2": session dials for a diag run
    // (e.g. spark.graft.broadcast.maxRows=0 to measure the size-guard's
    // shuffle-join form) without a code edit per experiment. Comma is
    // the pair separator, so VALUES containing commas can't ride this
    // env var; tokens without '=' are skipped with a warning rather
    // than crashing the diag.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v) // Builder mutates in place
          case _ => System.err.println(s"[diag] ignoring malformed conf token '$kv' (no '=')")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    queries.TextOps.warmDedupClusters(spark, sfDir)
    queries.TextOps.warmSharedFrames(spark, sfDir)
    queries.PipelineOps.warmCleanCorpus(spark, sfDir)
    queries.IndexOps.warmPersistedIndexes(spark, sfDir)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0)
    val inputBytes = new AtomicLong(0)
    val shufRecs = new AtomicLong(0)
    val shufBytes = new AtomicLong(0)
    val lastEvent = new AtomicLong(System.nanoTime())
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); lastEvent.set(System.nanoTime())
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
        if (m != null) {
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        lastEvent.set(System.nanoTime())
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def drain(): Unit = {
      // listener events are async — wait for 400ms of bus silence
      while ((System.nanoTime() - lastEvent.get()) < 400L * 1000 * 1000)
        Thread.sleep(50)
    }
    for (n <- names) {
      // one untimed warm run absorbs JIT so the counted run is steady-state
      SparkEntry.queries(n)(spark, sfDir).count()
      drain()
      jobs.set(0); stages.set(0); tasks.set(0)
      inputBytes.set(0); shufRecs.set(0); shufBytes.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[shuffle] $n%-28s jobs=${jobs.get}%3d stages=${stages.get}%3d " +
        f"tasks=${tasks.get}%5d input=${inputBytes.get / 1e6}%9.1f MB " +
        f"shufRecs=${shufRecs.get}%10d shufMB=${shufBytes.get / 1e6}%9.2f sec=$sec%7.2f")
    }
    spark.stop()
  }
}
