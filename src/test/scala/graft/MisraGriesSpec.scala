package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Misra-Gries heavy-hitters sketch: the two guarantees the
  * `agg_heavy_hitters` exact-confirm design rests on, asserted under
  * adversarial partitioning on a planted-skew stream where item
  * cardinality (2000) far exceeds sketch capacity (k=64):
  *   - candidate superset: every item with true freq > n/(k+1) is in
  *     the merged sketch,
  *   - error bounds: est ≤ true and true − est ≤ n/(k+1).
  */
class MisraGriesSpec extends SparkSpecBase {

  // 3 planted heavies over a 2000-item uniform tail: n = 11200,
  // n/(k+1) = 11200/65 ≈ 172 — h1/h2/h3 are above, every tail item
  // (5 occurrences) is far below.
  private lazy val stream: Seq[String] =
    Seq.fill(600)("h1") ++ Seq.fill(400)("h2") ++ Seq.fill(200)("h3") ++
      (0 until 2000).flatMap(i => Seq.fill(5)(s"t$i"))
  private val k = 64

  test("planted heavies survive the sketch at every partitioning") {
    import spark.implicits._
    val n = stream.size
    val bound = n.toDouble / (k + 1)
    val trueCounts = stream.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val mg = udaf(MisraGries.agg(k))
    for (parts <- Seq(1, 7, 64)) {
      val sk = stream.toDS().repartition(parts)
        .agg(mg($"value").as("sk")).select($"sk.*").as[MisraGries.Sketch].head()
      val est = sk.keys.zip(sk.counts).toMap
      assert(sk.keys.length <= k, s"state bounded by k at parts=$parts")
      for (h <- Seq("h1", "h2", "h3"))
        assert(est.contains(h), s"heavy $h must survive at parts=$parts")
      for ((item, e) <- est) {
        val t = trueCounts(item)
        assert(e <= t, s"$item over-counted at parts=$parts: est=$e true=$t")
        assert(t - e <= bound, s"$item under-counted past n/(k+1) at parts=$parts")
      }
    }
  }

  test("cardinality ≤ k: the sketch is exact") {
    import spark.implicits._
    val small = (0 until 10).flatMap(i => Seq.fill(i + 1)(s"x$i"))
    val mg = udaf(MisraGries.agg(k))
    val sk = small.toDS().repartition(5)
      .agg(mg($"value").as("sk")).select($"sk.*").as[MisraGries.Sketch].head()
    val est = sk.keys.zip(sk.counts).toMap
    assert(est == (0 until 10).map(i => s"x$i" -> (i + 1).toLong).toMap)
  }

  test("agg_heavy_hitters entry equals the exact flat aggregation") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("agg_heavy_hitters")(spark, dir)
      .as[(String, Long)].collect().toSeq
    val terms = graft.Core.load(spark, dir, "documents")
      .select(explode(graft.Core.tokens(lower($"text"))).as("term"))
    val total = terms.count()
    val exact = terms.groupBy($"term").agg(count(lit(1)).as("n"))
      .filter($"n" * 64 > total)
      .orderBy($"term").as[(String, Long)].collect().toSeq
    assert(got == exact, "sketch-pruned + exact-confirm must equal the flat form")
    assert(got.nonEmpty, "fixture must exercise a non-empty heavy set")
  }
}
