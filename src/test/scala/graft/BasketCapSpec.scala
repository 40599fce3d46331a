package graft

import org.apache.spark.sql.functions._

/** spark.graft.graph.basketCap (r12 verdict ask #6): the pair-join
  * graph entries' bot-basket dial. Contracts: (a) a cap above the
  * fixture's largest basket changes NOTHING — the gate oracles keep
  * holding with the dial on at a sane serving value; (b) the cap
  * actually bounds per-user basket cardinality and is a deterministic
  * hash-ranked sample; (c) default (off) is the exact frame.
  */
class BasketCapSpec extends SparkSpecBase {
  import spark.implicits._

  private def withCap[T](n: Int)(f: => T): T = {
    spark.conf.set("spark.graft.graph.basketCap", n.toString)
    try f finally spark.conf.unset("spark.graft.graph.basketCap")
  }

  private def run(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq

  for (fx <- Seq("sf0.001", "sf0.01");
       name <- Seq("assoc_rules", "graph_jaccard_similarity", "graph_triangle_count")) {
    test(s"$name unchanged under a cap above the max fixture basket ($fx)") {
      val dir = sf(fx)
      val maxBasket = graft.queries.GraphOps.baskets(spark, dir)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .agg(max($"n")).collect().head.getLong(0)
      val uncapped = run(name, dir)
      val capped = withCap(10000)(run(name, dir))
      assert(maxBasket < 10000, s"fixture basket $maxBasket approaches the test cap")
      assert(capped == uncapped,
        s"$name drifted under a no-op cap (max basket $maxBasket << 10000)")
    }
  }

  test("the cap bounds per-user cardinality and samples deterministically") {
    val dir = sf("sf0.01")
    val (capped1, capped2) = withCap(3) {
      val a = graft.queries.GraphOps.baskets(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = graft.queries.GraphOps.baskets(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (a, b)
    }
    assert(capped1 == capped2, "hash-ranked sample must be run-deterministic")
    val perUser = capped1.groupBy(_._1).map(_._2.size)
    assert(perUser.max <= 3, s"cap=3 left a basket of ${perUser.max}")
    // the cap keeps a real subset of the uncapped frame
    val full = graft.queries.GraphOps.baskets(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped1.subsetOf(full), "capped frame must be a subset of the exact frame")
    assert(capped1.size < full.size, "cap=3 on this fixture must actually truncate")
  }

  test("the fanout tripwire refuses a planted fat-basket frame and names both dials") {
    // one bot user with 60 items: Σ basket² = 3600 + the 10 normal
    // singletons — over a bound of 1000, under the default 2e9
    val planted = ((0 until 60).map(i => (999L, i.toLong)) ++
      (0 until 10).map(i => (i.toLong, 0L))).toDF("user_id", "item")
    spark.conf.set("spark.graft.graph.maxPairFanout", "1000")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.queries.GraphOps.guardBaskets(spark, planted, None)
      }
      assert(e.getMessage.contains("spark.graft.graph.basketCap") &&
        e.getMessage.contains("maxPairFanout") &&
        e.getMessage.contains("3610"),
        s"refusal must name both dials and the measured fanout: ${e.getMessage}")
      // the escape the message names: capping defuses the trip (no
      // stats pass at all) and bounds the basket
      spark.conf.set("spark.graft.graph.basketCap", "8")
      try {
        val capped = graft.queries.GraphOps.guardBaskets(spark, planted, None)
        val perUser = capped.groupBy($"user_id").agg(count(lit(1)).as("n"))
          .agg(max($"n")).collect().head.getLong(0)
        assert(perUser <= 8, s"cap must bound the planted basket, got $perUser")
      } finally spark.conf.unset("spark.graft.graph.basketCap")
    } finally spark.conf.unset("spark.graft.graph.maxPairFanout")
  }

  test("an empty basket frame reads (0,0,0) — the guard passes it, no NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "item")
    // an empty groupBy-agg yields one row (count=0, max=null, sum=null);
    // the null branch must read as zero fanout, not crash the entry
    assert(graft.queries.GraphOps.basketStats(empty) === ((0L, 0L, 0L)))
    assert(graft.queries.GraphOps.guardBaskets(spark, empty, None).count() === 0L)
  }

  test("the tripwire passes the gate fixture untouched at the default bound") {
    val dir = sf("sf0.01")
    // same rows out as the raw distinct frame — the guard is a no-op
    // below the bound (r16 ask #3: declared outputs unchanged)
    val viaGuard = graft.queries.GraphOps.baskets(spark, dir).count()
    val (users, maxB, sumSq) = graft.queries.GraphOps.basketStats(
      graft.queries.GraphOps.baskets(spark, dir))
    assert(viaGuard > 0 && users > 0 && maxB > 0)
    assert(sumSq < 2000000000L, s"gate fixture fanout $sumSq should sit far under the default")
  }
}
