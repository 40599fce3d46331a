package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins BOTH branches of `Core.loadEvents`'s adaptive `ts` read.
  *
  * The driver regenerated `/root/testdata` mid-stream (2026-08-13),
  * switching `events.ts` from INT64 TIMESTAMP(NANOS) to plain
  * `timestamp[us]` (TIMESTAMP_NTZ) — which broke the then-hard-coded
  * nanos path at plan time and took out the whole events family for a
  * round (VERDICT r9). The loader now branches on the dtype it finds;
  * this spec proves each branch by writing the SAME logical events table
  * in every encoding and asserting query-identical reads, so the next
  * encoding drift breaks a test here instead of the round gate.
  */
class EventsEncodingSpec extends SparkSpecBase {

  /** sf0.001 with events.parquet rewritten in the given encoding; all
    * other tables symlinked so full SparkEntry queries run unchanged.
    */
  private def encodedDir(name: String)(writeEvents: (DataFrame, String) => Unit): String = {
    val src = sf("sf0.001")
    val out = Files.createTempDirectory(s"graft-evenc-$name").toString
    for (t <- new java.io.File(src).list(); if t != "events.parquet")
      Files.createSymbolicLink(Paths.get(s"$out/$t"), Paths.get(s"$src/$t"))
    writeEvents(Core.loadEvents(spark, src), s"$out/events.parquet")
    out
  }

  private lazy val ntzDir = encodedDir("ntz") { (ev, path) =>
    // the driver's current encoding: timestamp[us], no tz annotation
    ev.withColumn("ts", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
  private lazy val nanosDir = encodedDir("nanos") { (ev, path) =>
    // the legacy encoding as loadEvents SEES it: under
    // spark.sql.legacy.parquet.nanosAsLong=true an INT64 TIMESTAMP(NANOS)
    // column surfaces as a plain long of nanos — a plain INT64 column of
    // nanos exercises the identical LongType branch and div-1000 rebuild
    ev.withColumn("ts",
        (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
  private lazy val tzDir = encodedDir("tz") { (ev, path) =>
    // a third plausible drift: annotated isAdjustedToUTC timestamp[us],
    // which Spark reads as plain TimestampType → pass-through branch
    ev.coalesce(1).write.mode("overwrite").parquet(path)
  }

  test("loadEvents adapts to all three ts encodings with identical values") {
    val dirs = Map("ntz" -> ntzDir, "nanos" -> nanosDir, "tz" -> tzDir)
    val reads = dirs.map { case (n, d) =>
      val ev = Core.loadEvents(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"$n: wrong dtype")
      n -> ev.select(col("event_id"), Core.tsStr(col("ts")))
        .orderBy(col("event_id")).collect().map(_.toString).toSeq
    }
    assert(reads("ntz").nonEmpty)
    assert(reads("nanos") == reads("ntz"), "nanos branch diverges from ntz")
    assert(reads("tz") == reads("ntz"), "tz branch diverges from ntz")
  }

  test("events queries are byte-identical across ts encodings") {
    // full declared queries (not just the raw read) over a time-window
    // agg, an as-of join, and a JSON-props op — the three events-family
    // shapes with the most timestamp/codegen structure between them
    for (q <- Seq("ts_tumbling", "join_asof", "fn_json")) {
      val base = SparkEntry.queries(q)(spark, ntzDir).collect().map(_.toString).toSeq
      val legacy = SparkEntry.queries(q)(spark, nanosDir).collect().map(_.toString).toSeq
      assert(base.nonEmpty, s"$q returned no rows")
      assert(legacy == base, s"$q diverges between ntz and legacy-nanos encodings")
    }
  }
}
