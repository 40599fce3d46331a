package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Core._

/** Time-series windowing over the `events` table (SURVEY.md §2.9, batch
  * forms). The same `window`/`session_window` expressions run unchanged on
  * a Structured Streaming source — streaming execution semantics
  * (watermarks, late data) are covered by MemoryStream unit tests, not
  * oracles.
  */
object TimeSeriesQ {

  /** Lake-scale quantile dial (r12 verdict ask #3). The exact-quantile
    * anomaly entries (ts_anomaly_mad, ts_outlier_iqr) aggregate with
    * `median`/`percentile`, which buffer the full per-group value
    * multiset — correct and oracle-exact at gate SF, unbounded memory
    * at 100 TB where one event_type can hold billions of values.
    * `spark.graft.quantile.approx=true` swaps every stats-pass quantile
    * to percentile_approx (Greenwald–Khanna sketch: buffer bounded by
    * the accuracy dial `spark.graft.quantile.accuracy`, default 10000,
    * at ANY group cardinality, and partials merge associatively like
    * any other agg — the map-side-combine property the exact form
    * loses at scale). The sketch returns a member of the data (no
    * interpolation) within rank error n/accuracy, so fences/medians
    * shift slightly and outlier FLAGS can disagree near a fence;
    * QuantileDialSpec bounds the flag disagreement against the exact
    * path on both gate fixtures (measured: zero disagreements — the
    * fixtures' fence neighborhoods are empty at that rank error).
    * Default stays exact: the DuckDB oracles demand exact order
    * statistics, and the dial is the documented lake deployment knob.
    */
  private[graft] def quantileApprox(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.get("spark.graft.quantile.approx", "false").toBoolean

  private[graft] def quantileAccuracy(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get("spark.graft.quantile.accuracy", "10000").toInt

  /** One quantile aggregate, dial-routed: exact `percentile` (the
    * oracle-matching interpolating form) or the bounded-memory sketch.
    */
  private def pctile(s: org.apache.spark.sql.SparkSession,
                     c: org.apache.spark.sql.Column, p: Double): org.apache.spark.sql.Column =
    if (quantileApprox(s)) percentile_approx(c, lit(p), lit(quantileAccuracy(s)))
    else call_function("percentile", c, lit(p))

  val entries: Seq[Entry] = Seq(
    entry(
      "ts_ohlc",
      """WITH r AS (SELECT user_id, date_trunc('hour', ts) AS h, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  round(min(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
        |  round(max(value), 4) AS high, round(min(value), 4) AS low,
        |  round(min(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
        |  count(*) AS n
        |FROM r GROUP BY user_id, h ORDER BY user_id, hour""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // OHLC downsampling (open-high-low-close per user per hour) — the
      // classic time-series bar aggregation — in ONE two-phase hash
      // aggregate: open/close are min_by/max_by on a (ts, event_id)
      // struct ORDER (deterministic under ties), so there is no
      // per-group window sort anywhere; partials merge associatively
      // like any other agg. The oracle expresses the same tie-break
      // through row_number because DuckDB's arg_min/arg_max cannot take
      // a composite ordering.
      loadEvents(s, dir)
        .withColumn("h", date_trunc("hour", $"ts"))
        .groupBy($"user_id", $"h")
        .agg(
          round(min_by($"value", struct($"ts", $"event_id")), 4).as("open"),
          round(max($"value"), 4).as("high"),
          round(min($"value"), 4).as("low"),
          round(max_by($"value", struct($"ts", $"event_id")), 4).as("close"),
          count(lit(1)).as("n"))
        .select($"user_id", tsStrSec($"h").as("hour"),
          $"open", $"high", $"low", $"close", $"n")
        .orderBy($"user_id", $"hour")
    },

    entry(
      "ts_downsample_lttb",
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS x, value AS y
        |  FROM events),
        |w AS (SELECT *,
        |    row_number() OVER ww AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    lag(x) OVER ww AS xp, lag(y) OVER ww AS yp,
        |    lead(x) OVER ww AS xn, lead(y) OVER ww AS yn
        |  FROM e WINDOW ww AS (PARTITION BY event_type ORDER BY x, event_id)),
        |a AS (SELECT *, (rn - 1) * 20 // n AS bucket,
        |    abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) AS area2
        |  FROM w),
        |keep AS (
        |  SELECT event_type, event_id, x, y FROM a WHERE rn = 1 OR rn = n
        |  UNION ALL
        |  SELECT event_type, event_id, x, y FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type, bucket
        |        ORDER BY area2 DESC, event_id) AS pk
        |    FROM a WHERE rn > 1 AND rn < n) WHERE pk = 1)
        |SELECT event_type, event_id, CAST(x AS BIGINT) AS ts_us,
        |  round(y, 4) AS value
        |FROM keep ORDER BY event_type, ts_us, event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Largest-triangle downsampling (LTTB family, one-bucket
      // neighbor variant) — the standard lossy series reduction for
      // dashboards/previews: each per-type series keeps its endpoints
      // plus, per time-order bucket (20 here), the single point whose
      // triangle with its immediate neighbors has the largest area —
      // spikes and inflections survive, flat runs collapse.
      // Determinism: the area is per-ROW arithmetic on (lag, lead)
      // neighbors — no aggregation-order float sums anywhere — and
      // the per-bucket argmax ties on event_id, so the selection is
      // exact on both engines.
      //
      // Scale shape: two linear per-series window passes over ONE
      // (event_type)-partitioned sort (rank/neighbors, then the
      // per-(type, bucket) argmax — Spark plans the second as a
      // WindowGroupLimit-style top-1 on the already-sorted runs); no
      // shuffle beyond the series key, state per row is O(1). Output
      // is series × buckets — viewer-sized by construction. At 100 TB
      // the parallel unit is the series key; for few fat series the
      // dial is bucket-count-per-task pre-aggregation (bucket becomes
      // part of the partition key; endpoints stitch per task).
      val e = loadEvents(s, dir)
        .select($"event_type", $"event_id", unix_micros($"ts").as("x"), $"value".as("y"))
      val ww  = Window.partitionBy($"event_type").orderBy($"x", $"event_id")
      val all = Window.partitionBy($"event_type")
      val a = e
        .withColumn("rn", row_number().over(ww))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("xp", lag($"x", 1).over(ww))
        .withColumn("yp", lag($"y", 1).over(ww))
        .withColumn("xn", lead($"x", 1).over(ww))
        .withColumn("yn", lead($"y", 1).over(ww))
        .withColumn("bucket", expr("(rn - 1) * 20 DIV n"))
        .withColumn("area2",
          abs(($"xp" - $"xn") * ($"y" - $"yp") - ($"xp" - $"x") * ($"yn" - $"yp")))
      val ends = a.filter($"rn" === 1 || $"rn" === $"n")
        .select($"event_type", $"event_id", $"x", $"y")
      val pk = Window.partitionBy($"event_type", $"bucket")
        .orderBy($"area2".desc, $"event_id")
      val interior = a.filter($"rn" > 1 && $"rn" < $"n")
        .withColumn("pk", row_number().over(pk))
        .filter($"pk" === 1)
        .select($"event_type", $"event_id", $"x", $"y")
      ends.unionByName(interior)
        .select($"event_type", $"event_id", $"x".as("ts_us"),
          round($"y", 4).as("value"))
        .orderBy($"event_type", $"ts_us", $"event_id")
    },

    entry(
      "ts_attribution",
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS pt,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS val_micro
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS v_id, user_id, epoch_us(ts) AS vt
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.p_id, p.val_micro, v.v_id,
        |    1000000 // (1 + (p.pt - v.vt) // 3600000000) AS w
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.vt <= p.pt AND p.pt - v.vt <= 7 * 86400000000),
        |t AS (SELECT p_id, sum(w) AS tw FROM j GROUP BY 1),
        |c AS (SELECT j.v_id, j.val_micro * j.w // t.tw AS credit_micro
        |  FROM j JOIN t ON j.p_id = t.p_id)
        |SELECT v_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(credit_micro) AS BIGINT) AS attributed_micro
        |FROM c GROUP BY v_id
        |ORDER BY attributed_micro DESC, v_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Multi-touch attribution (time-decay) — the marketing-analytics
      // op behind "which impression gets credit for this conversion":
      // every purchase splits its value across the user's views in the
      // preceding 7 days, weighted by inverse age in hours, and each
      // view accumulates its credited value across all purchases it
      // influenced. The one-to-MANY credit split is what distinguishes
      // this from join_asof (last-touch is the rank-1 special case).
      //
      // Determinism: EXACT integer fixed-point end to end — value is
      // rounded into micro-units BEFORE the cast (CAST alone rounds in
      // DuckDB but truncates in Spark — a real ulp trap), weights and
      // credit splits are integer DIV, and the final per-view sums are
      // exact long sums (associative at any partitioning).
      //
      // Scale shape: one user-keyed equi-join with the 7-day window as
      // a residual predicate — per-user fanout is views×purchases
      // WITHIN the window, the inherent output size of attribution
      // (bounded by user activity rate × window, not history length);
      // the per-purchase weight totals are a purchase-keyed hash-agg
      // joined back on the same key. At 100 TB the window predicate is
      // what keeps the join linear-ish; pathological users (bots) are
      // the skew dial — cap views-per-window or salt the hot user
      // keys, same discipline as join_skew_salted. Top-20 via
      // TakeOrderedAndProject.
      val ev = loadEvents(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id", unix_micros($"ts").as("pt"),
          round($"value" * 1000000, 0).cast("long").as("val_micro"))
      val v = ev.filter($"event_type" === "view")
        .select($"event_id".as("v_id"), $"user_id", unix_micros($"ts").as("vt"))
      val j = p.join(v, Seq("user_id"))
        .filter($"vt" <= $"pt" && $"pt" - $"vt" <= 7L * 86400000000L)
        .select($"p_id", $"val_micro", $"v_id",
          expr("1000000L DIV (1 + (pt - vt) DIV 3600000000L)").as("w"))
      val t = j.groupBy($"p_id").agg(sum($"w").as("tw"))
      j.join(t, "p_id")
        .select($"v_id", expr("val_micro * w DIV tw").as("credit_micro"))
        .groupBy($"v_id")
        .agg(count(lit(1)).as("n_purchases"), sum($"credit_micro").as("attributed_micro"))
        .orderBy($"attributed_micro".desc, $"v_id")
        .limit(20)
    },

    entry(
      "ts_ewma",
      """SELECT user_id, event_id, round(
        |    list_sum(list_transform(w, (x, i) -> x * power(0.6, len(w) - i))) /
        |    list_sum(list_transform(w, (x, i) -> power(0.6, len(w) - i))), 6) AS ewma
        |FROM (SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w
        |  FROM events)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Exponentially-weighted moving average over the trailing 8
      // observations per user (α=0.4, normalized weights — the
      // finite-window form of pandas' adjust=true EWMA). The recursion
      // is unrolled into an explicit weighted sum over a BOUNDED frame:
      // a per-user partitioned window collects the trailing list (state
      // ≤ 8 values — never the user's history) and codegen'd
      // higher-order functions fold weights (1-α)^age in the SAME
      // left-to-right operand order as the oracle's list_sum, so the
      // doubles are identical, not tolerance-gated. An infinite-memory
      // EWMA would need a sequential per-key scan (the mapPartitions
      // escape hatch); the trailing-window form is what keeps it a
      // plain associative window at 100 TB.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-7, 0)
      loadEvents(s, dir)
        .select($"user_id", $"event_id", collect_list($"value").over(w).as("w"))
        .select($"user_id", $"event_id",
          round(
            aggregate(
              zip_with($"w", sequence(lit(1), size($"w")),
                (x, i) => x * pow(lit(0.6), size($"w").cast("double") - i)),
              lit(0.0), (a, x) => a + x) /
            aggregate(
              zip_with($"w", sequence(lit(1), size($"w")),
                (x, i) => pow(lit(0.6), size($"w").cast("double") - i)),
              lit(0.0), (a, x) => a + x), 6).as("ewma"))
        .orderBy($"user_id", $"event_id")
    },

    entry(
      "ts_resample_ffill",
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    round(sum(value), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id),
        |j AS (SELECT g.user_id, g.day, d.v FROM grid g LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  v IS NULL AS is_gap
        |FROM j ORDER BY user_id, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // Resample to a dense per-user daily grid and forward-fill gaps —
      // the time-series regularization step before any daily feature
      // join. The grid explodes per user from that user's own observed
      // range (no cross join with a global calendar), the fill is one
      // partitioned window; daily sums round BEFORE filling so the
      // carried value is byte-stable.
      val daily = loadEvents(s, dir)
        .select($"user_id", to_date($"ts").as("day"), $"value")
        .groupBy($"user_id", $"day")
        .agg(round(sum($"value"), 4).as("v"))
      val grid = daily.groupBy($"user_id")
        .agg(min($"day").as("mn"), max($"day").as("mx"))
        .select($"user_id",
          explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled", last($"v", ignoreNulls = true).over(w))
        .select($"user_id", dayStr($"day").as("day"), $"filled",
          $"v".isNull.as("is_gap"))
        .orderBy($"user_id", $"day")
    },

    entry(
      "ts_interpolate_linear",
      """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    round(sum(value), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id),
        |j AS (SELECT g.user_id, g.day, d.v FROM grid g LEFT JOIN daily d USING (user_id, day)),
        |k AS (SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE round(pv + (nv - pv) * date_diff('day', pd, day) * 1.0
        |                       / date_diff('day', pd, nd), 4) END AS filled,
        |  v IS NULL AS is_gap
        |FROM k ORDER BY user_id, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // Gap-fill by LINEAR INTERPOLATION — the sibling of
      // ts_resample_ffill for series where carrying the last value
      // misrepresents a trend (sensor/metric rollups): each missing
      // grid day gets prev + (next − prev)·elapsed/span from its
      // nearest observed neighbors. Same per-user grid (exploded from
      // the user's own observed range — every gap is interior, so both
      // neighbors always exist), two partitioned windows (backward
      // last + forward first, each carrying value AND day); daily sums
      // round before interpolating and the interpolant rounds after,
      // so both engines see identical IEEE operands.
      val daily = loadEvents(s, dir)
        .select($"user_id", to_date($"ts").as("day"), $"value")
        .groupBy($"user_id", $"day")
        .agg(round(sum($"value"), 4).as("v"))
      val grid = daily.groupBy($"user_id")
        .agg(min($"day").as("mn"), max($"day").as("mx"))
        .select($"user_id",
          explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("day"))
      val wPrev = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val knownDay = when($"v".isNotNull, $"day")
      grid.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", $"v",
          last($"v", ignoreNulls = true).over(wPrev).as("pv"),
          last(knownDay, ignoreNulls = true).over(wPrev).as("pd"),
          first($"v", ignoreNulls = true).over(wNext).as("nv"),
          first(knownDay, ignoreNulls = true).over(wNext).as("nd"))
        .select($"user_id", dayStr($"day").as("day"),
          when($"v".isNotNull, $"v").otherwise(
            round($"pv" + ($"nv" - $"pv") * datediff($"day", $"pd") / datediff($"nd", $"pd"), 4))
            .as("filled"),
          $"v".isNull.as("is_gap"))
        .orderBy($"user_id", $"day")
    },

    entry(
      "ts_peak_detect",
      """WITH d AS (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, cents,
        |    lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev,
        |    lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS nxt
        |  FROM d)
        |SELECT event_type, day, round(cents / 100.0, 2) AS day_value,
        |  round(prev / 100.0, 2) AS prev_value, round(nxt / 100.0, 2) AS next_value
        |FROM w
        |WHERE prev IS NOT NULL AND nxt IS NOT NULL AND cents > prev AND cents > nxt
        |ORDER BY event_type, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Local-maximum peak detection on the per-type daily series —
      // the spike finder alerting/capacity dashboards run (a strict
      // local max over both neighbors; the changepoint/anomaly
      // siblings catch level shifts and point outliers, this catches
      // the one-day crests). Exact integer cents (the ts_decompose
      // micro-unit device) make the daily sums and the strict
      // comparisons partition-order-exact in both engines. Scale
      // shape: events collapse to the (type, day) frame FIRST (one
      // two-phase hash-agg); the lag/lead windows run on the
      // calendar-bounded day frame, never event volume.
      val d = loadEvents(s, dir)
        .groupBy($"event_type", dayStr($"ts").as("day"))
        .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      d.withColumn("prev", lag($"cents", 1).over(w))
        .withColumn("nxt", lead($"cents", 1).over(w))
        .filter($"prev".isNotNull && $"nxt".isNotNull &&
          $"cents" > $"prev" && $"cents" > $"nxt")
        .select($"event_type", $"day",
          round($"cents" / 100.0, 2).as("day_value"),
          round($"prev" / 100.0, 2).as("prev_value"),
          round($"nxt" / 100.0, 2).as("next_value"))
        .orderBy($"event_type", $"day")
    },

    entry(
      "ts_outlier_iqr",
      """WITH q AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(f.q1, 4) AS q1, round(f.q3, 4) AS q3,
        |  round(f.lo, 4) AS lo, round(f.hi, 4) AS hi
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type, f.q1, f.q3, f.lo, f.hi
        |ORDER BY e.event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Tukey IQR outlier fences per event type — the quartile-based
      // member of the anomaly family (MAD = robust-median,
      // zscore = moment-based, IQR = the boxplot rule dashboards and
      // dq monitors default to): fences at Q1/Q3 ∓ 1.5·IQR, reported
      // with per-type outlier counts. Both engines interpolate exact
      // quantiles with the same (1−f)·lower + f·upper rule on the
      // identical 2dp-valued doubles (the agg_percentile device), so
      // the UNROUNDED fences are bit-identical and the strict
      // comparisons agree; fences are rounded only for display. Scale
      // shape: one stats pass per type — quantiles route through the
      // [[pctile]] dial (spark.graft.quantile.approx swaps in the
      // bounded-memory GK sketch at lake scale) — fences broadcast back
      // onto a single fact scan — the agg_stats_zscore plan.
      val q = loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(pctile(s, $"value", 0.25).as("q1"),
          pctile(s, $"value", 0.75).as("q3"))
        .select($"event_type", $"q1", $"q3",
          ($"q1" - lit(1.5) * ($"q3" - $"q1")).as("lo"),
          ($"q3" + lit(1.5) * ($"q3" - $"q1")).as("hi"))
      loadEvents(s, dir)
        .join(broadcast(q), "event_type")
        .groupBy($"event_type", $"q1", $"q3", $"lo", $"hi")
        .agg(count(lit(1)).as("n"),
          sum(when($"value" < $"lo" || $"value" > $"hi", 1L).otherwise(0L)).as("n_outliers"))
        .select($"event_type", $"n", $"n_outliers",
          round($"q1", 4).as("q1"), round($"q3", 4).as("q3"),
          round($"lo", 4).as("lo"), round($"hi", 4).as("hi"))
        .orderBy($"event_type")
    },

    entry(
      "ts_anomaly_mad",
      """WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type, m.med, median(abs(e.value - m.med)) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type, m.med)
        |SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
        |  round(abs(e.value - m.med) / m.mad, 4) AS score
        |FROM events e JOIN mad m USING (event_type)
        |WHERE m.mad > 0 AND abs(e.value - m.med) > 3 * m.mad
        |ORDER BY e.event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Robust per-group anomaly detection: flag events whose value
      // sits more than 3 median-absolute-deviations from the group
      // median — the outlier gate a metrics pipeline runs where
      // mean/stddev (agg_stats_zscore) would let the outliers inflate
      // their own threshold. Two passes over the fact (median, then
      // MAD of residuals), each reduced to a GROUP-sized stats table
      // that broadcasts back onto the scan — at 100 TB both joins stay
      // map-side and the medians route through the [[pctile]] dial
      // (spark.graft.quantile.approx=true swaps in the bounded-memory
      // GK sketch; QuantileDialSpec bounds the flag drift). Medians
      // stay UNROUNDED through the residual pass (both engines select
      // the same middle elements from identical doubles), rounding only
      // in the declared output.
      val ev = loadEvents(s, dir).select($"event_id", $"event_type", $"value")
      val med = ev.groupBy($"event_type").agg(pctile(s, $"value", 0.5).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type", $"med")
        .agg(pctile(s, abs($"value" - $"med"), 0.5).as("mad"))
      ev.join(broadcast(mad), "event_type")
        .filter($"mad" > 0 && abs($"value" - $"med") > lit(3) * $"mad")
        .select($"event_id", $"event_type", round($"value", 4).as("value"),
          round(abs($"value" - $"med") / $"mad", 4).as("score"))
        .orderBy($"event_id")
    },

    entry(
      "ts_funnel",
      """WITH v AS (SELECT user_id, min(ts::TIMESTAMP) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS tc FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > v.tv GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS tp FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.tc GROUP BY 1)
        |SELECT v.user_id,
        |  strftime(tv, '%Y-%m-%d %H:%M:%S.%f') AS t_view,
        |  strftime(tc, '%Y-%m-%d %H:%M:%S.%f') AS t_click,
        |  strftime(tp, '%Y-%m-%d %H:%M:%S.%f') AS t_purchase,
        |  1 + CASE WHEN tc IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN tp IS NULL THEN 0 ELSE 1 END AS depth
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Funnel / event-sequence match (view → click → purchase): per
      // user, the first view, the first click strictly after it, the
      // first purchase strictly after that — the conversion-analysis
      // shape. Three conditional min-aggregations + two joins; each
      // stage's frame shrinks to users who reached it, so at scale the
      // deep-funnel joins touch progressively less data. The oracle
      // truncates DuckDB's ns timestamps to µs (ts::TIMESTAMP) so both
      // engines compare the same instants (Spark reads µs).
      val e = loadEvents(s, dir)
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("tv"))
      val c = e.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"tv").groupBy($"user_id").agg(min($"ts").as("tc"))
      val p = e.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts" > $"tc").groupBy($"user_id").agg(min($"ts").as("tp"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select($"user_id",
          tsStr($"tv").as("t_view"), tsStr($"tc").as("t_click"),
          tsStr($"tp").as("t_purchase"),
          (lit(1) + when($"tc".isNotNull, 1).otherwise(0)
                  + when($"tp".isNotNull, 1).otherwise(0)).as("depth"))
        .orderBy($"user_id")
    },

    entry(
      "ts_tumbling",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 4).as("total"))
        .select(dayStr($"window.start").as("day"), $"event_type", $"cnt", $"total")
        .orderBy($"day", $"event_type")
    },

    // Sliding 1h windows every 30min: each event belongs to exactly two
    // windows (the 30-min floor and the one before it) — the oracle
    // materializes the same two starts per event via unnest.
    entry(
      "ts_sliding",
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type, count(*) AS cnt
        |FROM (SELECT event_type,
        |        unnest([to_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT))::TIMESTAMP,
        |                to_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT))::TIMESTAMP
        |                  - INTERVAL 30 MINUTE]) AS ws
        |      FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .select(tsStrSec($"window.start").as("ws"), $"event_type", $"cnt")
        .orderBy($"ws", $"event_type")
    },

    // Session windows, 30-minute gap. Spark `session_window` closes a
    // session when the next event is >= gap after the previous one; the
    // oracle reproduces that with gaps-and-islands (lag + cumulative sum).
    entry(
      "ts_session",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end, count(*) AS cnt
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(min($"ts").as("mn"), max($"ts").as("mx"), count(lit(1)).as("cnt"))
        .select($"user_id", tsStr($"mn").as("s_start"), tsStr($"mx").as("s_end"), $"cnt")
        .orderBy($"user_id", $"s_start")
    },

    entry(
      "ts_gap_detect",
      """WITH d AS (SELECT event_type,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hi) AS h0, max(hi) AS h1 FROM d GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hi FROM b),
        |miss AS (SELECT g.event_type, g.hi FROM g
        |  LEFT JOIN d ON d.event_type = g.event_type AND d.hi = g.hi
        |  WHERE d.hi IS NULL),
        |runs AS (SELECT event_type,
        |    hi - row_number() OVER (PARTITION BY event_type ORDER BY hi) AS grp
        |  FROM miss),
        |rl AS (SELECT event_type, grp, count(*) AS run_len FROM runs GROUP BY 1, 2)
        |SELECT b.event_type,
        |  CAST(coalesce(sum(run_len), 0) AS BIGINT) AS n_missing_hours,
        |  CAST(coalesce(max(run_len), 0) AS BIGINT) AS longest_gap_hours
        |FROM b LEFT JOIN rl ON rl.event_type = b.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Coverage-gap report (the dq_freshness sibling for INTERIOR
      // holes): per type, how many hour cells inside the observed span
      // have zero events, and the LONGEST consecutive outage — silence
      // mid-history that max-lag freshness can't see. Missing cells
      // come from a per-type hour grid anti-joined against observed
      // hours; consecutive cells collapse into runs with the classic
      // gaps-and-islands key (cell − row_number is constant within a
      // run). Scale shape: the event stream reduces to DISTINCT
      // (type, hour) FIRST (two-phase agg — the only lake-scale pass);
      // the grid, anti-join, islands window and run aggregate all run
      // on span-sized frames (types × hours). All-integer output.
      val d = loadEvents(s, dir)
        .select($"event_type",
          (unix_micros(date_trunc("hour", $"ts")) / lit(3600000000L)).cast("long").as("hi"))
        .distinct()
      val b = d.groupBy($"event_type").agg(min($"hi").as("h0"), max($"hi").as("h1"))
      val g = b.select($"event_type", explode(sequence($"h0", $"h1")).as("hi"))
      val miss = g.join(d, Seq("event_type", "hi"), "left_anti")
      val w = Window.partitionBy($"event_type").orderBy($"hi")
      val rl = miss.withColumn("grp", $"hi" - row_number().over(w))
        .groupBy($"event_type", $"grp").agg(count(lit(1)).as("run_len"))
      b.join(rl, Seq("event_type"), "left")
        .groupBy($"event_type")
        .agg(coalesce(sum($"run_len"), lit(0L)).as("n_missing_hours"),
          coalesce(max($"run_len"), lit(0L)).as("longest_gap_hours"))
        .orderBy($"event_type")
    },

    entry(
      "ts_forecast_linear",
      """WITH d AS (SELECT event_type,
        |    epoch_us(date_trunc('day', ts)) // 86400000000 AS di, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, min(di) AS d0 FROM d GROUP BY 1),
        |f AS (SELECT d.event_type,
        |    regr_slope(c, di - d0) AS slope, regr_intercept(c, di - d0) AS icept,
        |    max(di - d0) AS span, count(*) AS n_days
        |  FROM d JOIN m ON m.event_type = d.event_type GROUP BY 1)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  round(slope, 4) AS slope_per_day,
        |  round(icept + slope * (span + 1), 2) AS forecast_next_day
        |FROM f ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Per-type next-day volume forecast by least-squares trend — the
      // capacity-planning one-liner on top of the regr aggregate
      // family: fit daily counts against a day index CENTERED at each
      // type's first day (centering keeps the extrapolation point
      // small, so slope ulps aren't amplified by an epoch-sized x —
      // the determinism lesson from agg_regression's per-hour x), then
      // extrapolate one day past the span. The regression runs on the
      // AGGREGATED (type, day) series — days × types rows — never the
      // event stream; co-moment partials merge associatively and 4dp/
      // 2dp rounding absorbs partial-order ulps.
      val d = loadEvents(s, dir)
        .groupBy($"event_type",
          (unix_micros(date_trunc("day", $"ts")) / lit(86400000000L)).cast("long").as("di"))
        .agg(count(lit(1)).as("c"))
      val m = d.groupBy($"event_type".as("et2")).agg(min($"di").as("d0"))
      d.join(broadcast(m), $"event_type" === $"et2")
        .groupBy($"event_type")
        .agg(
          regr_slope($"c", $"di" - $"d0").as("slope"),
          regr_intercept($"c", $"di" - $"d0").as("icept"),
          max($"di" - $"d0").as("span"),
          count(lit(1)).as("n_days"))
        .select($"event_type", $"n_days",
          round($"slope", 4).as("slope_per_day"),
          round($"icept" + $"slope" * ($"span" + 1), 2).as("forecast_next_day"))
        .orderBy($"event_type")
    },

    entry(
      "ts_autocorr",
      """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.c AS c0, b.c AS c1
        |  FROM d a JOIN d b ON a.event_type = b.event_type
        |    AND b.day = a.day + INTERVAL 1 DAY)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(corr(c0, c1), 4) AS acf1
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Lag-1 autocorrelation of the daily volume series per type —
      // the "is today predictive of tomorrow" one-number diagnostic
      // behind seasonality/forecast decisions (an ACF near 0 says the
      // daily series is noise; near ±1 says trend/oscillation).
      // Scale shape: the heavy work is the (type, day) count — a
      // two-phase hash-agg off the scan; the lag pairing is an
      // equi-join ON THE AGGREGATED series (days × types rows, not
      // events), and corr's co-moment partials merge associatively
      // (the agg_corr_covar contract, rounded at 4dp). Integer day
      // counts make corr's inputs exact.
      val d = loadEvents(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("c"))
      val a = d.select($"event_type", $"day", $"c".as("c0"))
      val b = d.select($"event_type".as("et2"), ($"day" - expr("INTERVAL 1 DAY")).as("day2"),
        $"c".as("c1"))
      a.join(b, $"event_type" === $"et2" && $"day" === $"day2")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_pairs"), round(corr($"c0", $"c1"), 4).as("acf1"))
        .orderBy($"event_type")
    },

    entry(
      "ts_cumulative_distinct",
      """WITH e AS (SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item,
        |    date_trunc('day', ts) AS d
        |  FROM events WHERE event_type = 'click'),
        |f AS (SELECT user_id, item, min(d) AS first_d FROM e GROUP BY 1, 2),
        |c AS (SELECT user_id, first_d AS d, count(*) AS new_items FROM f GROUP BY 1, 2)
        |SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
        |  CAST(new_items AS BIGINT) AS new_items,
        |  CAST(sum(new_items) OVER (PARTITION BY user_id ORDER BY d
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_to_date
        |FROM c ORDER BY user_id, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Running distinct count (per-user catalog discovery curve: how
      // many DISTINCT items each user has clicked to date, by day).
      // The naive window form — count(DISTINCT item) OVER an expanding
      // frame — holds a per-row distinct SET in window state and is a
      // scale-killer; the reduction here is the standard trick:
      // distinct-to-date ≡ running SUM of first-occurrence counts, so
      // the heavy work is one (user, item) min-aggregate (two-phase,
      // map-side combine) and the window runs over the (user, day)
      // aggregated frame with O(1) state. Exact integers throughout.
      val e = loadEvents(s, dir)
        .filter($"event_type" === "click")
        .select($"user_id", get_json_object($"props", "$.k").cast("long").as("item"),
          date_trunc("day", $"ts").as("d"))
      val f = e.groupBy($"user_id", $"item").agg(min($"d").as("first_d"))
      val c = f.groupBy($"user_id", $"first_d".as("d"))
        .agg(count(lit(1)).as("new_items"))
      val w = Window.partitionBy($"user_id").orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.select($"user_id", dayStr($"d").as("day"), $"new_items",
          sum($"new_items").over(w).as("distinct_to_date"))
        .orderBy($"user_id", $"day")
    },

    entry(
      "ts_retention_cohort",
      """WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort,
        |    datediff('day', f.cohort, date_trunc('day', e.ts)) AS offset_d
        |  FROM events e JOIN f USING (user_id))
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, offset_d,
        |  count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Retention-cohort triangle — the product-analytics staple the
      // funnel/session family was missing: users bucketed by their
      // FIRST active day, counted distinct on each later day they
      // return (offset 0 row = cohort size). Scale shape: the cohort
      // frame is a per-user partial agg on the same user_id key the
      // join then reuses (one shuffle feeds both), the activity set is
      // distinct'd on (user, cohort, offset) BEFORE the count so no
      // count-distinct state survives to the final tiny agg, and the
      // output is cohorts x offsets — bounded by the calendar, not the
      // event volume.
      val ev = loadEvents(s, dir).select($"user_id", to_date($"ts").as("day"))
      val cohort = ev.groupBy($"user_id").agg(min($"day").as("cohort"))
      ev.join(cohort, "user_id")
        .select($"user_id", $"cohort",
          datediff($"day", $"cohort").cast("long").as("offset_d"))
        .distinct()
        .groupBy($"cohort", $"offset_d")
        .agg(count(lit(1)).as("n_users"))
        .select(dayStr($"cohort").as("cohort_day"), $"offset_d", $"n_users")
        .orderBy($"cohort_day", $"offset_d")
    },

    entry(
      "win_streak",
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
        |g AS (SELECT user_id, day - CAST(rn AS INTEGER) AS anchor FROM r),
        |s AS (SELECT user_id, anchor, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Longest consecutive-day activity streak per user — the classic
      // gaps-and-islands window pattern (day minus its per-user rank is
      // constant exactly along a consecutive run, so the derived anchor
      // date IS the island key). Engagement/retention metric the cohort
      // triangle doesn't give you. Scale shape: events collapse to
      // DISTINCT (user, day) FIRST — the window then sorts the
      // calendar-bounded day frame, never the event stream, and each
      // user's partition is at most the span in days. Everything
      // downstream is hash aggregation on integer counts — exact at any
      // partitioning.
      loadEvents(s, dir)
        .select($"user_id", to_date($"ts").as("day")).distinct()
        .withColumn("rn",
          row_number().over(Window.partitionBy($"user_id").orderBy($"day")))
        .select($"user_id", date_sub($"day", $"rn").as("anchor"))
        .groupBy($"user_id", $"anchor").agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(max($"len").as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum($"len").as("active_days"))
        .orderBy($"user_id")
    },

    entry(
      "ts_seasonality",
      """WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT event_type, hod, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // tot AS BIGINT) AS rate_ppm
        |FROM c JOIN t USING (event_type)
        |ORDER BY event_type, hod""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Hour-of-day seasonality profile per event type (integer-ppm
      // share of the type's traffic in each hour) — the diurnal
      // fingerprint capacity planning and anomaly baselines consume;
      // a type whose profile flattens or shifts is the seasonal
      // regression profile_drift's halves can't see. Scale shape: ONE
      // two-phase hash-agg on the (type, hour) key — 24 × |types|
      // output rows regardless of event volume; the per-type totals
      // derive from the aggregated frame (never a second corpus scan)
      // and broadcast back. All-integer output, hash-exact.
      val c = loadEvents(s, dir)
        .groupBy($"event_type", hour($"ts").cast("long").as("hod"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy($"event_type").agg(sum($"n").as("tot"))
      c.join(broadcast(t), "event_type")
        .select($"event_type", $"hod", $"n",
          expr("n * 1000000L DIV tot").as("rate_ppm"))
        .orderBy($"event_type", $"hod")
    },

    entry(
      "ts_changepoint_cusum",
      """WITH v AS (SELECT user_id, ts, event_id,
        |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vm FROM events),
        |m AS (SELECT user_id, sum(vm) // count(*) AS mu FROM v GROUP BY 1),
        |p AS (SELECT v.user_id, ts, event_id,
        |    sum(vm - mu) OVER (PARTITION BY v.user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS pref
        |  FROM v JOIN m USING (user_id)),
        |c AS (SELECT user_id, ts, event_id,
        |    pref - least(min(pref) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING), 0) AS cusum
        |  FROM p),
        |r AS (SELECT user_id, event_id, cusum,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cusum DESC, ts, event_id) AS rn FROM c)
        |SELECT user_id, CAST(cusum AS BIGINT) AS max_cusum_micro,
        |  event_id AS at_event
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // One-sided CUSUM changepoint statistic per user (Page 1954):
      // S_i = max(0, S_{i-1} + (x_i − μ)). The recursion looks
      // sequential, but reduces to prefix-sum minus running-min
      // (S_i = P_i − min_{0≤j≤i} P_j — the min MUST include the
      // virtual P₀ = 0, hence least(·, 0): without it a drift that
      // starts at the first event is clipped while every prefix sum
      // is still positive) — two ASSOCIATIVE window
      // aggregates over the same per-user sort, which is what keeps it
      // a plain partitioned window at 100 TB instead of a sequential
      // per-key scan. The row where S peaks is the changepoint
      // candidate; its magnitude is the drift score a monitor alerts
      // on. Exactness: inputs quantize to integer 10⁻⁴ units and μ is
      // the integer-floor mean (sums are positive, so Spark's DIV and
      // the oracle's // agree), making every window value an exact
      // integer — deterministic at any partitioning. Scale shape: one
      // tiny per-user agg broadcast back, then ONE shuffle on user_id
      // feeds both windows and the final argmax rank; per-user state
      // in each window frame is O(1).
      val v = loadEvents(s, dir)
        .select($"user_id", $"ts", $"event_id",
          floor($"value" * 10000 + 0.5).cast("long").as("vm"))
      val mu = v.groupBy($"user_id")
        .agg(expr("sum(vm) DIV count(*)").as("mu"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      v.join(broadcast(mu), "user_id")
        .withColumn("pref", sum($"vm" - $"mu").over(w))
        .withColumn("cusum", $"pref" - least(min($"pref").over(w), lit(0L)))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"cusum".desc, $"ts", $"event_id")))
        .filter($"rn" === 1)
        .select($"user_id", $"cusum".as("max_cusum_micro"), $"event_id".as("at_event"))
        .orderBy($"user_id")
    },

    entry(
      "ts_decompose",
      """WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
        |    FROM events GROUP BY 1),
        |t AS (SELECT day, n, sum(n) OVER w AS s7, count(*) OVER w AS c7,
        |    CAST(strftime(day, '%w') AS INT) AS dow
        |  FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT day, n, dow,
        |    CASE WHEN c7 = 7 THEN CAST((s7 * 1000000) // 7 AS BIGINT) END AS trend_micro,
        |    CASE WHEN c7 = 7 THEN CAST(n * 1000000 - (s7 * 1000000) // 7 AS BIGINT) END AS det_micro
        |  FROM t),
        |sraw AS (SELECT dow,
        |    CAST((sum(det_micro) + 1000000000 * count(det_micro)) // count(det_micro)
        |      - 1000000000 AS BIGINT) AS s_raw
        |  FROM det WHERE det_micro IS NOT NULL GROUP BY dow),
        |ctr AS (SELECT CAST((sum(s_raw) + 1000000000 * count(*)) // count(*)
        |      - 1000000000 AS BIGINT) AS g FROM sraw),
        |seas AS (SELECT dow, s_raw - g AS seasonal_micro FROM sraw CROSS JOIN ctr)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
        |  trend_micro, seasonal_micro,
        |  det_micro - seasonal_micro AS resid_micro
        |FROM det LEFT JOIN seas USING (dow) ORDER BY day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Classical additive decomposition of the daily volume series:
      // observed = trend + seasonal + residual. Trend is the centered
      // 7-row moving average (defined only on full windows), seasonal
      // is the mean detrended value per day-of-week re-centered to sum
      // ~zero across the week, residual is what's left — the anomaly
      // monitors' baseline input (MAD/CUSUM fire on residuals, not raw
      // counts, once volume has weekly structure). Exactness: all
      // arithmetic in integer micro-units; the floor divisions add a
      // +1e9·cnt offset so the numerator is positive, making Spark's
      // truncating DIV equal DuckDB's flooring // even when the
      // detrended sums are negative. Scale shape: events collapse to
      // the DAY frame first (one hash-agg — output is |days| rows
      // regardless of event volume); the only unpartitioned window
      // runs over that bounded day frame, and the 7-row day-of-week
      // profile broadcasts back. Series-per-key variants partition
      // every window by the key and drop the exemption.
      val d = loadEvents(s, dir)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy($"day").rowsBetween(-3, 3)
      val det = d
        .withColumn("s7", sum($"n").over(w))
        .withColumn("c7", count(lit(1)).over(w))
        .withColumn("dow", (dayofweek($"day") - 1).cast("int"))
        .withColumn("trend_micro",
          when($"c7" === 7, expr("s7 * 1000000L DIV 7")))
        .withColumn("det_micro", $"n" * lit(1000000L) - $"trend_micro")
      val sraw = det.filter($"det_micro".isNotNull).groupBy($"dow")
        .agg(expr("(sum(det_micro) + 1000000000L * count(det_micro)) " +
          "DIV count(det_micro) - 1000000000L").as("s_raw"))
      val ctr = sraw.agg(expr(
        "(sum(s_raw) + 1000000000L * count(*)) DIV count(*) - 1000000000L").as("g"))
      val seas = sraw.crossJoin(broadcast(ctr))
        .select($"dow", ($"s_raw" - $"g").as("seasonal_micro"))
      det.join(broadcast(seas), Seq("dow"), "left")
        .select(date_format($"day", "yyyy-MM-dd").as("day"), $"n",
          $"trend_micro", $"seasonal_micro",
          ($"det_micro" - $"seasonal_micro").as("resid_micro"))
        .orderBy($"day")
    },

    entry(
      "ts_decompose_anomaly",
      """WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
        |    FROM events GROUP BY 1),
        |t AS (SELECT day, n, sum(n) OVER w AS s7, count(*) OVER w AS c7,
        |    CAST(strftime(day, '%w') AS INT) AS dow
        |  FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT day, n, dow,
        |    CASE WHEN c7 = 7 THEN CAST(n * 1000000 - (s7 * 1000000) // 7 AS BIGINT) END AS det_micro
        |  FROM t),
        |sraw AS (SELECT dow,
        |    CAST((sum(det_micro) + 1000000000 * count(det_micro)) // count(det_micro)
        |      - 1000000000 AS BIGINT) AS s_raw
        |  FROM det WHERE det_micro IS NOT NULL GROUP BY dow),
        |ctr AS (SELECT CAST((sum(s_raw) + 1000000000 * count(*)) // count(*)
        |      - 1000000000 AS BIGINT) AS g FROM sraw),
        |seas AS (SELECT dow, s_raw - g AS seasonal_micro FROM sraw CROSS JOIN ctr),
        |r AS (SELECT day, det_micro - seasonal_micro AS resid_micro
        |  FROM det LEFT JOIN seas USING (dow) WHERE det_micro IS NOT NULL),
        |med AS (SELECT median(resid_micro) AS med FROM r),
        |mad AS (SELECT median(abs(resid_micro - med)) AS mad FROM r, med)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(resid_micro AS BIGINT) AS resid_micro,
        |  CAST(abs(resid_micro - med) > 3 * mad AS INT) AS is_anomaly
        |FROM r, med, mad ORDER BY day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Residual-based anomaly flags — the reason ts_decompose exists:
      // once volume has weekly structure, thresholding RAW counts fires
      // every Saturday (ts_anomaly_mad's limitation on seasonal series);
      // thresholding the DECOMPOSITION RESIDUAL (observed − trend −
      // seasonal) at 3·MAD flags only days that deviate from their own
      // seasonal norm. Same exact-integer decomposition as
      // ts_decompose; the median/MAD are exact order statistics over
      // the bounded residual frame (integers, so the even-count
      // interpolation at x.5 is exact in both engines), each a 1-row
      // broadcast back onto the day frame.
      val d = loadEvents(s, dir)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy($"day").rowsBetween(-3, 3)
      val det = d
        .withColumn("s7", sum($"n").over(w))
        .withColumn("c7", count(lit(1)).over(w))
        .withColumn("dow", (dayofweek($"day") - 1).cast("int"))
        .withColumn("det_micro",
          when($"c7" === 7, $"n" * lit(1000000L) - expr("s7 * 1000000L DIV 7")))
        .filter($"det_micro".isNotNull)
      val sraw = det.groupBy($"dow")
        .agg(expr("(sum(det_micro) + 1000000000L * count(det_micro)) " +
          "DIV count(det_micro) - 1000000000L").as("s_raw"))
      val ctr = sraw.agg(expr(
        "(sum(s_raw) + 1000000000L * count(*)) DIV count(*) - 1000000000L").as("g"))
      val seas = sraw.crossJoin(broadcast(ctr))
        .select($"dow", ($"s_raw" - $"g").as("seasonal_micro"))
      val r = det.join(broadcast(seas), Seq("dow"), "left")
        .select($"day", ($"det_micro" - $"seasonal_micro").as("resid_micro"))
      val med = r.agg(expr("percentile(resid_micro, 0.5D)").as("med"))
      val dev = r.crossJoin(broadcast(med))
      val mad = dev.agg(expr("percentile(abs(resid_micro - med), 0.5D)").as("mad"))
      dev.crossJoin(broadcast(mad))
        .select(date_format($"day", "yyyy-MM-dd").as("day"), $"resid_micro",
          (abs($"resid_micro" - $"med") > lit(3) * $"mad").cast("int").as("is_anomaly"))
        .orderBy($"day")
    },

    entry(
      "ts_markov_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
        |      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src, sum(n) AS tn FROM t GROUP BY 1)
        |SELECT src, dst, n, round(n * 1.0 / tn, 6) AS p
        |FROM t JOIN tot USING (src) ORDER BY src, dst""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // First-order Markov transition matrix over per-user event
      // sequences — the journey-analysis primitive (what follows a
      // signup? where do error loops sit?). One shuffle on user_id for
      // the sequence window (the same partitioned-sort every
      // sessionization entry pays), after which the space collapses to
      // |types|² transition cells; the per-source normalizer is a
      // broadcast of that tiny frame. p = n/tn divides exact integers,
      // so the probabilities are bit-identical across engines.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val t = loadEvents(s, dir)
        .select($"event_type", lead($"event_type", 1).over(w).as("nxt"))
        .filter($"nxt".isNotNull)
        .groupBy($"event_type".as("src"), $"nxt".as("dst"))
        .agg(count(lit(1)).as("n"))
      val tot = t.groupBy($"src").agg(sum($"n").as("tn"))
      t.join(broadcast(tot), "src")
        .select($"src", $"dst", $"n", round($"n" * 1.0 / $"tn", 6).as("p"))
        .orderBy($"src", $"dst")
    },

    entry(
      "ts_moving_median",
      """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  round(median(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
        |FROM d ORDER BY event_type, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // 7-row moving MEDIAN of the per-type daily volume — the robust
      // smoother (a single spike day drags a moving average but not the
      // median; monitoring baselines want this next to ts_ewma /
      // ts_anomaly_mad). Events collapse to the (type, day) frame first
      // — one hash-agg, output bounded by types × calendar span — and
      // the order-statistic window runs over that bounded frame only,
      // partitioned by type. Spark's `median` aggregate rejects window
      // frames, so the order statistic is taken from the frame's
      // collect_list sorted in place — O(7 log 7) per row on the
      // bounded day frame, never on raw events. Counts are integers,
      // so the even-frame interpolation (x.5) is exact in both engines.
      val d = loadEvents(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"day").rowsBetween(-6, 0)
      val arr = sort_array(collect_list($"n").over(w))
      val k = size(arr)
      val med = (element_at(arr, ((k + lit(1)) / 2).cast("int")) +
        element_at(arr, (k / 2 + lit(1)).cast("int"))) / 2.0
      d.select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"), $"n",
          round(med, 4).as("med7"))
        .orderBy($"event_type", $"day")
    },

    entry(
      "ts_rolling_corr",
      """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT day, sum(n) AS tn FROM d GROUP BY 1),
        |j AS (SELECT event_type, day, n, tn FROM d JOIN tot USING (day)),
        |w AS (SELECT event_type, day, count(*) OVER fr AS k,
        |    sum(n) OVER fr AS sx, sum(tn) OVER fr AS sy,
        |    sum(n * n) OVER fr AS sxx, sum(tn * tn) OVER fr AS syy,
        |    sum(n * tn) OVER fr AS sxy
        |  FROM j WINDOW fr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CASE WHEN k = 14 AND k * sxx - sx * sx > 0 AND k * syy - sy * sy > 0
        |    THEN round(CAST(k * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(k * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(k * syy - sy * sy AS DOUBLE))), 4) END AS corr14
        |FROM w ORDER BY event_type, day""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // 14-day rolling Pearson correlation between each type's daily
      // volume and TOTAL daily volume — the co-movement monitor (a type
      // decoupling from overall traffic is a leading incident signal;
      // error volume correlating with traffic is load-driven, error
      // volume decorrelating is a regression). Same bounded-frame
      // discipline as ts_moving_median: the day frame is built once,
      // the total rides a tiny per-day broadcast join, and the sum
      // windows are type-partitioned. The correlation is assembled from
      // EXACT integer moment sums (counts are integers, so sx/sxx/sxy
      // are order-independent longs) with one explicitly-ordered double
      // formula on both sides — engine corr() built-ins differ in
      // accumulation order and NaN conventions; this is bit-portable.
      // Partial frames (< 14 days) and zero-variance frames emit NULL.
      val d = loadEvents(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = d.groupBy($"day").agg(sum($"n").as("tn"))
      val w = Window.partitionBy($"event_type").orderBy($"day").rowsBetween(-13, 0)
      val vx = $"k" * $"sxx" - $"sx" * $"sx"
      val vy = $"k" * $"syy" - $"sy" * $"sy"
      val c = ($"k" * $"sxy" - $"sx" * $"sy").cast("double") /
        (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))
      d.join(broadcast(tot), "day")
        .select($"event_type", $"day",
          count(lit(1)).over(w).as("k"),
          sum($"n").over(w).as("sx"), sum($"tn").over(w).as("sy"),
          sum($"n" * $"n").over(w).as("sxx"),
          sum($"tn" * $"tn").over(w).as("syy"),
          sum($"n" * $"tn").over(w).as("sxy"))
        .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
          when($"k" === 14 && vx > 0 && vy > 0, round(c, 4)).as("corr14"))
        .orderBy($"event_type", $"day")
    },

    entry(
      "ts_holt_linear",
      """WITH RECURSIVE d AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY date_trunc('day', ts)) AS rn
        |  FROM events GROUP BY event_type, date_trunc('day', ts)),
        |h(event_type, rn, s, b) AS (
        |  SELECT event_type, CAST(1 AS BIGINT), n * 1000000, CAST(0 AS BIGINT)
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT h.event_type, h.rn + 1,
        |    (2 * d.n * 1000000 + 8 * (h.s + h.b) + 10000000000000000) // 10
        |      - 1000000000000000,
        |    (((2 * d.n * 1000000 + 8 * (h.s + h.b) + 10000000000000000) // 10
        |      - 1000000000000000) - h.s + 9 * h.b + 10000000000000000) // 10
        |      - 1000000000000000
        |  FROM h JOIN d ON d.event_type = h.event_type AND d.rn = h.rn + 1),
        |f AS (SELECT event_type, max(rn) AS n_days FROM h GROUP BY 1)
        |SELECT h.event_type, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS s_micro, CAST(b AS BIGINT) AS b_micro,
        |  CAST(s + b AS BIGINT) AS forecast_micro
        |FROM h JOIN f ON f.event_type = h.event_type AND h.rn = f.n_days
        |ORDER BY h.event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Holt double exponential smoothing (level + trend, α=0.2 β=0.1)
      // per event-type daily series — the one-step volume forecast with
      // trend, next to ts_ewma (level only) and ts_forecast_linear
      // (global fit). The recurrence s_t = αy_t + (1−α)(s+b),
      // b_t = β(s_t−s) + (1−β)b is SEQUENTIAL by nature — the
      // distributable shape is: collapse events to the bounded per-type
      // day frame (one hash-agg — the only pass over raw volume), then
      // run the recursion as a higher-order `aggregate` FOLD over each
      // type's sorted day array, one task per type, O(|days|) each.
      // Series count scales out (one fold per key), series length is
      // calendar-bounded — the same two-level contract as ts_decompose.
      // Exactness: integer micro fixed-point; the +10¹⁶ offset before
      // each ÷10 keeps numerators positive so Spark's truncating DIV
      // equals DuckDB's flooring // even when the trend goes negative
      // (same device as ts_decompose).
      val d = loadEvents(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      d.groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"n"))).as("dd"))
        .select($"event_type", expr("transform(dd, x -> x.n)").as("ys"))
        .select($"event_type", size($"ys").cast("long").as("n_days"),
          expr("""aggregate(slice(ys, 2, size(ys) - 1),
            named_struct('s', ys[0] * 1000000L, 'b', 0L),
            (a, y) -> named_struct(
              's', (2L * y * 1000000L + 8L * (a.s + a.b) + 10000000000000000L)
                     DIV 10L - 1000000000000000L,
              'b', ((2L * y * 1000000L + 8L * (a.s + a.b) + 10000000000000000L)
                     DIV 10L - 1000000000000000L - a.s + 9L * a.b
                     + 10000000000000000L) DIV 10L - 1000000000000000L))""")
            .as("h"))
        .select($"event_type", $"n_days", $"h.s".as("s_micro"),
          $"h.b".as("b_micro"), ($"h.s" + $"h.b").as("forecast_micro"))
        .orderBy($"event_type")
    }
  )
}
