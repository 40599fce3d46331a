package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Extends the events-encoding lesson (EventsEncodingSpec) to the other
  * driver-owned tables: the testdata generator has changed physical
  * types once mid-stream, so the loaders must tolerate the PLAUSIBLE
  * drifts of the remaining tables — embeddings written as
  * `array<double>` instead of `array<float>`, and integer ids written
  * at a narrower width. Each drifted corpus must produce query results
  * value-identical to the pristine one.
  */
class SchemaDriftSpec extends SparkSpecBase {
  import spark.implicits._

  /** sf0.001 with one table rewritten by `f`; everything else symlinked. */
  private def driftedDir(name: String, table: String)(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val src = sf("sf0.001")
    val out = Files.createTempDirectory(s"graft-drift-$name").toString
    for (t <- new java.io.File(src).list(); if t != s"$table.parquet")
      Files.createSymbolicLink(Paths.get(s"$out/$t"), Paths.get(s"$src/$t"))
    f(spark.read.parquet(s"$src/$table.parquet"))
      .coalesce(1).write.parquet(s"$out/$table.parquet")
    out
  }

  private def run(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq

  test("embeddings drift: array<double> + int vec_id serve identical vector results") {
    val drifted = driftedDir("embdouble", "embeddings") { df =>
      df.select(col("vec_id").cast("int").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"), col("label"))
    }
    for (q <- Seq("vec_knn_topk", "vec_cosine_pairs")) {
      val base = run(q, sf("sf0.001"))
      assert(base.nonEmpty)
      assert(run(q, drifted) == base, s"$q diverges on drifted embeddings")
    }
  }

  test("documents drift: int doc_id + pruned metadata width serve identical text results") {
    val drifted = driftedDir("docint", "documents") { df =>
      df.withColumn("doc_id", col("doc_id").cast("int"))
    }
    for (q <- Seq("dedup_exact", "text_token_count", "text_lang_id")) {
      val base = run(q, sf("sf0.001"))
      assert(base.nonEmpty)
      assert(run(q, drifted) == base, s"$q diverges on drifted documents")
    }
  }
}
