package graft

/** The lake-scale quantile dial (spark.graft.quantile.approx — r12
  * verdict ask #3): the exact-quantile anomaly entries must (a) keep
  * their oracle-exact default, (b) actually route to the bounded-memory
  * GK sketch when the dial is on, and (c) produce outlier FLAGS whose
  * disagreement with the exact path is bounded on both gate fixtures —
  * the sketch's rank error (n/accuracy) can only move a fence past
  * values in its immediate rank neighborhood, so flag drift is the
  * right thing to pin (fence VALUES legitimately differ: the sketch
  * returns a data member, the exact form interpolates).
  */
class QuantileDialSpec extends SparkSpecBase {

  private def withApprox[T](f: => T): T = {
    spark.conf.set("spark.graft.quantile.approx", "true")
    try f finally spark.conf.unset("spark.graft.quantile.approx")
  }

  private def madFlags(dir: String): Set[Long] =
    SparkEntry.queries("ts_anomaly_mad")(spark, dir)
      .select("event_id").collect().map(_.getLong(0)).toSet

  for (fx <- Seq("sf0.001", "sf0.01")) {
    test(s"ts_anomaly_mad approx flags match exact within the rank-error bound ($fx)") {
      val dir = sf(fx)
      val exact  = madFlags(dir)
      val approx = withApprox(madFlags(dir))
      val drift = (exact diff approx).size + (approx diff exact).size
      // rank error at accuracy=10000 on these fixtures is < 10 ranks per
      // group; measured drift is ZERO on both — the bound leaves room
      // only for values sitting exactly in a fence's rank neighborhood
      val bound = math.max(1, exact.size / 100)
      assert(drift <= bound,
        s"approx-path flag drift $drift exceeds bound $bound (exact=${exact.size}, approx=${approx.size})")
    }

    test(s"ts_outlier_iqr approx per-type outlier counts match exact within bound ($fx)") {
      val dir = sf(fx)
      def counts(): Map[String, Long] =
        SparkEntry.queries("ts_outlier_iqr")(spark, dir)
          .select("event_type", "n_outliers").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact  = counts()
      val approx = withApprox(counts())
      assert(exact.keySet == approx.keySet, "type coverage must not change under the dial")
      for ((t, n) <- exact) {
        val bound = math.max(1L, n / 50)
        assert(math.abs(approx(t) - n) <= bound,
          s"type $t: approx ${approx(t)} vs exact $n drifts past $bound")
      }
    }
  }

  test("the dial actually routes to percentile_approx (bounded-memory sketch) in the plan") {
    val dir = sf("sf0.001")
    val exactPlan = SparkEntry.queries("ts_outlier_iqr")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val approxPlan = withApprox(
      SparkEntry.queries("ts_outlier_iqr")(spark, dir)
        .queryExecution.optimizedPlan.toString)
    assert(!exactPlan.contains("percentile_approx"),
      "default path must stay oracle-exact (no sketch)")
    assert(approxPlan.contains("percentile_approx"),
      "dial on: stats pass must aggregate with the GK sketch")
    assert(!approxPlan.contains("percentile(") || approxPlan.contains("percentile_approx("),
      s"dial on: no exact percentile may remain in the stats pass")
  }
}
