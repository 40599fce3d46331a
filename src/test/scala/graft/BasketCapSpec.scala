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
}
