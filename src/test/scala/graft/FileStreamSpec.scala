package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

/** File-source streaming: the same transforms the MemoryStream specs
  * cover, driven through `readStream` over parquet files landing in a
  * directory — the shape a production ingestion stream actually has
  * (files arriving in a lake prefix).
  */
class FileStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("tumblingCounts over a parquet file stream (AvailableNow semantics)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // stage two files = two micro-batch arrivals
    val batch1 = Seq(
      (1L, 1L, "view", java.sql.Timestamp.valueOf("2026-01-01 10:00:05"), 1.0),
      (2L, 2L, "view", java.sql.Timestamp.valueOf("2026-01-01 10:00:40"), 2.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val batch2 = Seq(
      (3L, 1L, "click", java.sql.Timestamp.valueOf("2026-01-01 10:01:10"), 3.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    batch1.write.parquet(s"$dir/in/b1.parquet")
    batch2.write.parquet(s"$dir/in/b2.parquet")

    val stream = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(s"$dir/in/*")
    assert(stream.isStreaming)
    Streams.runToMemory(Streams.tumblingCounts(stream), "fs_out", OutputMode.Complete())
    val rows = spark.table("fs_out")
      .select($"w_start".cast("string"), $"event_type", $"n", $"total")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      ("2026-01-01 10:00:00", "view", 2L, 3.0),
      ("2026-01-01 10:01:00", "click", 1L, 3.0)))
  }

  test("checkpointed file-sink restart is exactly-once (no reprocessing)") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    def ev(id: Long, ts: String) = Seq((id, 1L, "view",
      java.sql.Timestamp.valueOf(ts), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    ev(1, "2026-01-01 10:00:05").write.parquet(s"$dir/in/b1.parquet")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in/*")
      val q = stream.writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()                                     // processes b1
    ev(2, "2026-01-01 10:00:50").write.parquet(s"$dir/in/b2.parquet")
    runOnce()                                     // restart: must only process b2
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 2, "each event exactly once across restarts")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
