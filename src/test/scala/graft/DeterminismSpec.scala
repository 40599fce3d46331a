package graft

import org.apache.spark.sql.SparkSession

/** SURVEY.md §5.2 determinism audit: every declared query must produce
  * IDENTICAL ordered output under different shuffle parallelism — the
  * driver hash-compares outputs, so partition-count-dependent results
  * (bare limits, nondeterministic picks, unordered floats) would flake.
  */
class DeterminismSpec extends SparkSpecBase {

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf("sf0.001")).collect().map(_.toString).toSeq
    }
    finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  test("every declared query is byte-identical at shuffle.partitions 4 vs 7") {
    val a = runAll(4)
    val b = runAll(7)
    val diff = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
    assert(diff.isEmpty, s"nondeterministic under repartitioning: $diff")
  }

  test("oracleSql keys are a subset of queries keys; entry returns rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
