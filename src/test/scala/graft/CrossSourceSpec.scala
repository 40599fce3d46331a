package graft

/** Pins the r18 mask-encoded cross-source aggregate: the bit_or
  * bitmask path (≤ 63 sources) must produce exactly the sorted-set
  * path's pairs, and its corpus aggregate must plan as a codegen
  * HashAggregate (the whole point — collect_set planned as
  * ObjectHashAggregate, outside WholeStageCodegen).
  */
class CrossSourceSpec extends SparkSpecBase {

  test("bitmask cross-source pairs equal the sorted-set form bit for bit") {
    val dict = queries.TextOps.sourceDict(spark, sf("sf0.001"))
    assert(dict.nonEmpty && dict.size <= 63,
      s"fixture should exercise the mask path (got ${dict.size} sources)")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("src_a", "src_b").collect().map(_.toString).toSeq
    val mask = canon(queries.TextOps.crossSourceAgg(spark, sf("sf0.001")))
    val sets = canon(queries.TextOps.crossSourceAggSets(spark, sf("sf0.001")))
    assert(mask == sets, "mask-encoded pairs diverged from the set form")
  }

  test("the corpus-sized gram aggregate is codegen (bit_or), not ObjectHashAggregate") {
    val ap = queries.TextOps.crossSourceAgg(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val ownTree = ap.linesIterator
      .takeWhile(l => !l.contains("InMemoryRelation")).toSeq
    assert(!ownTree.exists(_.contains("ObjectHashAggregate")),
      s"gram aggregate left codegen:\n$ap")
    assert(ownTree.exists(_.contains("HashAggregate")), ap)
  }
}
