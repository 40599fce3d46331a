package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan

/** Pins the r18 bucketed fact layout (FactLayout): the three heavy
  * fact-groupBy consumers must produce BIT-IDENTICAL output with the
  * layout on and off, and the bucketed path must actually remove the
  * corpus exchanges (the whole point — a silent fallback to the raw
  * scan would still be correct, so correctness tests alone can't catch
  * a layout that stopped engaging).
  */
class FactLayoutSpec extends SparkSpecBase {

  private val consumers =
    Seq("q21_lone_blame", "q2_min_cost_supplier", "agg_weighted_median")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect().map(_.toString).toSeq
  }

  private def collectShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = {
    val self = p match {
      case s: ShuffleExchangeLike => Seq(s)
      case _ => Seq.empty
    }
    // structural, not string-matched (the ADVICE r17 note): AQE wraps
    // every materialized exchange in a QueryStageExec LEAF, so the
    // wrapped plan must be recursed into explicitly; ReusedExchange is
    // deliberately NOT counted (it re-reads, never re-shuffles)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    self ++ kids.flatMap(collectShuffles) ++
      p.subqueries.flatMap(collectShuffles)
  }

  test("bucketed-layout consumers equal the raw-scan path bit for bit") {
    for (n <- consumers) {
      spark.conf.set("spark.graft.lake.factLayout.enabled", "false")
      val raw = rows(n)
      spark.conf.set("spark.graft.lake.factLayout.enabled", "true")
      val bucketed = rows(n)
      assert(bucketed == raw, s"$n: bucketed-layout output diverged from the raw scan")
    }
  }

  test("bucketed scans engage and the fact exchanges are gone") {
    spark.conf.set("spark.graft.lake.factLayout.enabled", "true")
    // q21: the ONLY shuffle left is the final per-supplier-name
    // aggregate — the pair groupBy, the per-order rollup and the ps⋈po
    // join all ride the bucket partitioning (raw-scan plan: 1.04 M recs
    // at sf0.1 across three corpus exchanges)
    val q21 = SparkEntry.queries("q21_lone_blame")(spark, sf("sf0.001"))
    q21.collect()
    val q21Shuffles = collectShuffles(q21.queryExecution.executedPlan)
    assert(q21Shuffles.size == 1,
      s"q21: expected exactly the final s_name exchange, got ${q21Shuffles.size}:\n" +
        q21Shuffles.mkString("\n"))
    // the scan itself must be a bucketed read (SelectedBucketsCount in
    // the formatted text witnesses bucketedScan = true)
    val plan = q21.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"),
      s"q21: fact scan is not bucketed\n$plan")
    // q2: the argmin join-back must stay single-key (the min-test is a
    // range residual) so it co-partitions — no shuffle anywhere except
    // (at most) AQE's tiny final pieces; structurally: no exchange may
    // carry the fact's partkey grain
    val q2 = SparkEntry.queries("q2_min_cost_supplier")(spark, sf("sf0.001"))
    q2.collect()
    val q2Shuffles = collectShuffles(q2.queryExecution.executedPlan)
    assert(q2Shuffles.isEmpty,
      s"q2: expected a shuffle-free plan over the bucketed layout, got:\n" +
        q2Shuffles.mkString("\n"))
    // weighted median: the entry's localCheckpoint truncates its final
    // plan, so pin the PRE-checkpoint stage directly — the (flag,
    // price) fact groupBy over the price-bucketed projection must plan
    // with zero shuffles (raw-scan plan: ~600 k recs on this exchange)
    import org.apache.spark.sql.functions.{col, sum}
    val g = queries.FactLayout.byPrice(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    g.collect()
    val gShuffles = collectShuffles(g.queryExecution.executedPlan)
    assert(gShuffles.isEmpty,
      s"weighted_median: the (flag, price) fact groupBy re-grew its exchange:\n" +
        gShuffles.mkString("\n"))
  }
}
