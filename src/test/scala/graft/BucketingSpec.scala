package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: two tables bucketed on the join key
  * join WITHOUT an Exchange — the co-located join pattern that matters
  * most at 100 TB (fact-fact joins where neither side broadcasts).
  */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed fact-fact join has no shuffle on the bucketed key") {
    // warehouse dir is static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally block.
    val orders = Core.load(spark, sf("sf0.001"), "orders")
      .select($"o_orderkey", $"o_totalprice")
    val lineitem = Core.load(spark, sf("sf0.001"), "lineitem")
      .select($"l_orderkey", $"l_quantity")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    // force the fact-fact (sort-merge) path: at this tiny SF the planner
    // would otherwise broadcast, which hides the property under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val expected = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
