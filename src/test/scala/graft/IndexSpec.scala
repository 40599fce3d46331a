package graft

import org.apache.spark.sql.functions._

/** Persisted similarity index: build-once-probe-many lifecycle
  * (reference engine.py:72-98). Asserts the probe reads the PERSISTED
  * tables instead of recomputing corpus signatures, and that its
  * results agree with the in-plan near-dup pipeline.
  */
class IndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("sim_index_build persists sets+bands; summary reflects the corpus") {
    val summary = SparkEntry.queries("sim_index_build")(spark, dir).collect()
    assert(summary.length == 4, "one summary row per LSH band")
    val nDocs = summary.head.getAs[Long]("n_docs")
    val withToks = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(graft.Core.tokens(lower($"text"))) > 0).count()
    assert(nDocs == withToks, s"index covers $nDocs of $withToks docs")
    for (sub <- Seq("sets.parquet", "bands.parquet")) {
      assert(new java.io.File(graft.queries.IndexOps.indexDir(dir) + "/" + sub).exists())
    }
  }

  test("sim_index_probe answers from the persisted index, no corpus signature recompute") {
    SparkEntry.queries("sim_index_build")(spark, dir).collect()
    val probe = SparkEntry.queries("sim_index_probe")(spark, dir)
    // Plan shape: reads the persisted index; the only corpus access is
    // the pushed-down single-row query read (one documents scan).
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("simindex"), "probe must scan the persisted index")
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(corpusScans <= 1, s"probe plan scans documents $corpusScans times (expected ≤1: the 1-row query side)")

    val got = probe.select($"doc_id", $"jaccard").as[(Long, Double)].collect()
    assert(got.nonEmpty, "probe must at least find the query's own set")
    assert(got.exists { case (id, j) => id == 0L && j == 1.0 },
      "query doc must match itself at jaccard 1.0")
    // Semantics: probe hits = doc 0's partners in the in-plan near-dup
    // pairs (same threshold 0.9), plus doc 0 itself.
    val pairs = SparkEntry.queries("text_dedup_near")(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    val expected = pairs.collect {
      case (0L, d2) => d2
      case (d1, 0L) => d1
    }.toSet + 0L
    assert(got.map(_._1).toSet == expected,
      s"probe set ${got.map(_._1).toSet} != near-dup partners $expected")
  }
}
