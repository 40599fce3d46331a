package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Core._

/** Relational operator families (SURVEY.md §2.2-2.7): projection/filter,
  * joins, aggregation, window functions, sort/limit/set ops, and the
  * temp-view SQL surface that replaces the reference's `CURRENT_TABLE`
  * string-splice (reference engine.py:58-63).
  *
  * Every entry follows the determinism discipline of SURVEY.md §2.1:
  * total ORDER BY with a unique tie-break key, ROUND(x,4) on floating
  * aggregates, explicit stddev_samp, UTC, no bare LIMIT.
  */
object Relational {

  /** TPC-H-Q1-shaped pricing summary — the flagship (SURVEY.md §7.1).
    * Scan → filter (pushed to parquet) → partial+final hash aggregate →
    * sort. At 100 TB this is a single shuffle on 6 tiny groups.
    */
  val q1 = entry(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity),4) AS sum_qty,
      |  round(sum(l_extendedprice),4) AS sum_base_price,
      |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
      |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
      |  round(avg(l_quantity),4) AS avg_qty,
      |  round(avg(l_extendedprice),4) AS avg_price,
      |  round(avg(l_discount),4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    load(s, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum($"l_extendedprice"), 4).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 4).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---- §2.3 projection / filter / row ops -------------------------------

  val projFilter: Seq[Entry] = Seq(
    entry(
      "proj_select",
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey"
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    entry(
      "proj_arith",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2))),4) AS DOUBLE) AS net_price,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))*(1+CAST(l_tax AS DECIMAL(4,2))),4) AS DOUBLE) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Money columns are 2-decimal values stored as double; casting to
      // decimal before the product makes the arithmetic exact in both
      // engines (double-product round(x,4) disagrees at 1-ulp boundaries).
      val price = $"l_extendedprice".cast("decimal(12,2)")
      val disc  = lit(1) - $"l_discount".cast("decimal(4,2)")
      val tax   = lit(1) + $"l_tax".cast("decimal(4,2)")
      load(s, dir, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        round(price * disc, 4).cast("double").as("net_price"),
        round(price * disc * tax, 4).cast("double").as("charge")
      ).orderBy($"l_orderkey", $"l_linenumber")
    },

    entry(
      "filter_pred",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 300000 AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders")
        .filter($"o_totalprice" > 300000 && $"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    entry(
      "filter_regex",
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '^Customer#0*[0-9]*[02468]$')
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .filter($"c_name".rlike("^Customer#0*[0-9]*[02468]$"))
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    entry(
      "filter_null",
      """SELECT event_id, user_id, value FROM events
        |WHERE props IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .na.drop(Seq("props", "value", "user_id"))
        .select($"event_id", $"user_id", $"value")
        .orderBy($"event_id")
    },

    entry(
      "distinct_rows",
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .select($"c_nationkey", $"c_mktsegment").distinct()
        .orderBy($"c_nationkey", $"c_mktsegment")
    },

    // Deterministic dedup: row_number, NOT dropDuplicates (whose row pick is
    // partition-order dependent — SURVEY.md §7.4).
    entry(
      "dedup_exact",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey")
    },

    entry(
      "limit_head",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber")
        .limit(10)
    }
  )

  // ---- §2.4 joins -------------------------------------------------------
  // Physical strategy is Catalyst's choice: dims (region/nation/customer/
  // supplier) fall under autoBroadcastJoinThreshold → BroadcastHashJoin;
  // fact-fact goes SortMergeJoin; AQE re-plans skew at runtime.

  val joins: Seq[Entry] = Seq(
    entry(
      "join_inner_equi",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders")
        .join(load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    entry(
      "join_left_outer",
      """SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .join(load(s, dir, "orders"), $"o_custkey" === $"c_custkey", "left")
        .select($"c_custkey", $"o_orderkey")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    },

    entry(
      "join_right_outer",
      """SELECT c_custkey, o_orderkey FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders")
        .join(load(s, dir, "customer"), $"o_custkey" === $"c_custkey", "right")
        .select($"c_custkey", $"o_orderkey")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    },

    entry(
      "join_full_outer",
      """SELECT c_custkey, s_suppkey FROM customer
        |FULL OUTER JOIN supplier ON c_nationkey = s_nationkey
        |ORDER BY c_custkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .join(load(s, dir, "supplier"), $"c_nationkey" === $"s_nationkey", "full")
        .select($"c_custkey", $"s_suppkey")
        .orderBy($"c_custkey".asc_nulls_first, $"s_suppkey".asc_nulls_first)
    },

    entry(
      "join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .join(load(s, dir, "orders"), $"o_custkey" === $"c_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // Anti-join against a date-filtered subset: every customer has SOME
    // order at sf0.01, so the unfiltered form passes vacuously on 0 rows.
    // "No order since 2000" yields 135 rows at sf0.01 — a wrong join type
    // can no longer hash-match by accident.
    entry(
      "join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val recent = load(s, dir, "orders")
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      load(s, dir, "customer")
        .join(recent, $"o_custkey" === $"c_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    entry(
      "join_cross",
      """SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "region").crossJoin(load(s, dir, "nation"))
        .select($"r_regionkey", $"r_name", $"n_nationkey", $"n_name")
        .orderBy($"r_regionkey", $"n_nationkey")
    },

    // Non-equi range join: same-user event pairs within a 5-minute window.
    // Equi-key on user_id keeps it a hash/sort-merge join with a range
    // residual — the scalable form (pure theta would be a BNLJ).
    entry(
      "join_theta_range",
      """SELECT a.user_id, count(*) AS pair_cnt
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        |     AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val ev = loadEvents(s, dir)
      val a = ev.select($"user_id", $"ts")
      val b = ev.select($"user_id".as("b_uid"), $"ts".as("b_ts"))
      a.join(b, $"user_id" === $"b_uid" && $"b_ts" > $"ts" &&
          $"b_ts" <= $"ts" + expr("INTERVAL 5 MINUTE"))
        .groupBy($"user_id").agg(count(lit(1)).as("pair_cnt"))
        .orderBy($"user_id")
    },

    // Interval-overlap join WITHOUT an equi key (no native interval join
    // in Spark): order windows [o_orderdate, +7d] against lineitem ship
    // windows [l_shipdate, +(l_orderkey%14)d] — joined the scale-correct
    // way, by BUCKETIZING both interval sets into week cells and
    // equi-joining on the cell: each interval explodes into O(len/7)+1
    // cells (≤3 resp. ≤4 here), a pair meets in every shared cell, the
    // distinct collapses the ≤4 duplicates, and the exact overlap
    // predicate runs only on cell-cohabitants — candidate mass is
    // Σ per-cell |A_c|·|B_c|, never |A|·|B| (a raw theta join would be
    // a BNLJ over the cross product). At 100 TB the cell width tracks
    // the typical interval length (one conf), hot cells split via AQE.
    // The oracle is the plain DuckDB theta join — same pairs by
    // construction since bucketization is candidate-complete: an
    // overlapping pair shares at least the cell containing
    // max(a.start, b.start).
    entry(
      "join_interval_overlap",
      """WITH a AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + 7 AS e
        |  FROM orders WHERE o_orderkey % 199 = 0),
        |b AS (SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + CAST(l_orderkey % 14 AS INTEGER) AS e
        |  FROM lineitem)
        |SELECT a.o_orderkey, count(*) AS n_items, round(sum(b.l_quantity), 4) AS sum_qty
        |FROM a JOIN b ON b.s <= a.e AND b.e >= a.s
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      def wk(c: org.apache.spark.sql.Column) =
        floor(datediff(c, lit("1995-01-01")) / 7)
      val a = load(s, dir, "orders")
        .filter($"o_orderkey" % 199 === 0)
        .select($"o_orderkey", $"o_orderdate".cast("date").as("a_s"))
        .withColumn("a_e", date_add($"a_s", 7))
      val b = load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_shipdate".cast("date").as("b_s"))
        .withColumn("b_e", date_add($"b_s", ($"l_orderkey" % 14).cast("int")))
      val aB = a.withColumn("bk", explode(sequence(wk($"a_s"), wk($"a_e"))))
      val bB = b.withColumn("bk", explode(sequence(wk($"b_s"), wk($"b_e"))))
      aB.join(bB, "bk")
        .filter($"b_s" <= $"a_e" && $"b_e" >= $"a_s" &&
          // each pair shares every cell of its overlap range — count it
          // ONLY in the cell where the overlap STARTS (unique per pair),
          // so no pair-level distinct is needed; this also keeps
          // byte-identical duplicate rows (the lake has planted dup
          // lineitems) counted once per physical row, exactly as the
          // oracle's theta join does
          $"bk" === wk(greatest($"a_s", $"b_s")))
        .select($"o_orderkey", $"l_quantity")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_items"), round(sum($"l_quantity"), 4).as("sum_qty"))
        .orderBy($"o_orderkey")
    },

    // As-of join (no native batch as-of in Spark — SURVEY.md §7.3): latest
    // prior 'view' per 'purchase' via range join + row_number pick.
    entry(
      "join_asof",
      """SELECT p_id, user_id, v_id FROM (
        |  SELECT p.event_id AS p_id, p.user_id AS user_id, v.event_id AS v_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM events p JOIN events v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts
        |  WHERE p.event_type = 'purchase' AND v.event_type = 'view') t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Scale-safe as-of: instead of the unbounded range self-join
      // (quadratic per hot user — views×purchases materialized before the
      // rank picks one), union both event kinds and carry the latest view
      // forward with last(_, ignoreNulls) over a rows-frame window: ONE
      // linear shuffle on user_id, O(events) state. Views sort before
      // purchases at equal ts (kind 0 < 1) so v.ts <= p.ts ties count;
      // same-ts views resolve to max event_id, matching the oracle's
      // ORDER BY v.ts DESC, v.event_id DESC pick.
      val ev = loadEvents(s, dir).filter($"event_type".isin("view", "purchase"))
      val tagged = ev.select($"event_id", $"user_id", $"ts",
        when($"event_type" === "view", 0).otherwise(1).as("kind"),
        when($"event_type" === "view", $"event_id").as("v_event"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("v_id", last($"v_event", ignoreNulls = true).over(w))
        .filter($"kind" === 1 && $"v_id".isNotNull)
        .select($"event_id".as("p_id"), $"user_id", $"v_id")
        .orderBy($"p_id")
    },

    entry(
      "join_asof_forward",
      """SELECT p_id, user_id, v_id FROM (
        |  SELECT p.event_id AS p_id, p.user_id AS user_id, v.event_id AS v_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts ASC, v.event_id ASC) AS rn
        |  FROM events p JOIN events v
        |    ON v.user_id = p.user_id AND v.ts >= p.ts
        |  WHERE p.event_type = 'purchase' AND v.event_type = 'view') t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // FORWARD as-of (pandas merge_asof direction='forward'): each
      // purchase pairs with its EARLIEST view at ts ≥ p.ts — the
      // "next reading after the event" convention (post-purchase
      // behavior, next sensor sample after an actuation). Completes
      // the as-of family (backward / tolerance / nearest / forward).
      // Same scale shape as join_asof, mirrored: ONE linear shuffle on
      // user_id, carry the nearest FUTURE view backward with a
      // ts-DESCENDING rows-frame window — never the views×purchases
      // range self-join. Tie discipline: at equal ts views sort before
      // purchases in the descending scan (kind 0 first) so v.ts >= p.ts
      // ties count, and same-ts views order event_id DESC so the
      // carried last() is the SMALLEST id — exactly the oracle's
      // ORDER BY v.ts ASC, v.event_id ASC pick.
      val ev = loadEvents(s, dir).filter($"event_type".isin("view", "purchase"))
      val tagged = ev.select($"event_id", $"user_id", $"ts",
        when($"event_type" === "view", 0).otherwise(1).as("kind"),
        when($"event_type" === "view", $"event_id").as("v_event"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"kind", $"event_id".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("v_id", last($"v_event", ignoreNulls = true).over(w))
        .filter($"kind" === 1 && $"v_id".isNotNull)
        .select($"event_id".as("p_id"), $"user_id", $"v_id")
        .orderBy($"p_id")
    },

    entry(
      "join_asof_tolerance",
      """WITH c AS (SELECT p_id, v_id FROM (
        |  SELECT p.event_id AS p_id, v.event_id AS v_id,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM events p JOIN events v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts
        |   AND v.ts >= p.ts - INTERVAL 1 HOUR
        |  WHERE p.event_type = 'purchase' AND v.event_type = 'view') t
        |  WHERE rn = 1)
        |SELECT p.event_id AS p_id, p.user_id AS user_id, c.v_id
        |FROM events p LEFT JOIN c ON c.p_id = p.event_id
        |WHERE p.event_type = 'purchase' ORDER BY p_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // As-of join with a STALENESS TOLERANCE — the sensor/market-data
      // convention (pandas merge_asof's `tolerance`): a purchase only
      // pairs with its latest view if that view is ≤ 1 hour old,
      // otherwise it keeps LEFT semantics and emits NULL (a stale match
      // is worse than no match for attribution). Same single
      // user-partitioned carry-forward as join_asof — one linear
      // shuffle, O(events) state, never the views×purchases range join
      // — with the tolerance applied AFTER the carry as a per-row
      // timestamp check (carrying the view's ts costs one more window
      // column, not another pass).
      val ev = loadEvents(s, dir).filter($"event_type".isin("view", "purchase"))
      val tagged = ev.select($"event_id", $"user_id", $"ts",
        unix_micros($"ts").as("tsu"),
        when($"event_type" === "view", 0).otherwise(1).as("kind"),
        when($"event_type" === "view", $"event_id").as("v_event"),
        when($"event_type" === "view", unix_micros($"ts")).as("v_tsu"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("cv", last($"v_event", ignoreNulls = true).over(w))
        .withColumn("ct", last($"v_tsu", ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"event_id".as("p_id"), $"user_id",
          when($"ct" >= $"tsu" - lit(3600000000L), $"cv").as("v_id"))
        .orderBy($"p_id")
    },

    entry(
      "join_fuzzy_levenshtein",
      """WITH p AS (SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk
        |  FROM part),
        |j AS (SELECT a.blk, levenshtein(a.p_name, b.p_name) AS d
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey)
        |SELECT blk, CAST(d AS BIGINT) AS distance, count(*) AS n_pairs
        |FROM j WHERE d <= 3 GROUP BY 1, 2 ORDER BY blk, distance""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Blocked fuzzy self-join (entity resolution): part names within
      // edit distance ≤ 3, candidates generated ONLY inside
      // first-token blocks — the standard ER blocking discipline (an
      // unblocked fuzzy join is all-pairs by definition; blocking
      // recall is a documented modeling choice, not an engine
      // approximation — the oracle applies the identical predicate).
      // Declared output is the per-block distance histogram (the match
      // audit); ER consumers take the same join unaggregated. Scale
      // shape: the block key is SALTED 16 ways (a-side takes a salt,
      // b-side replicates across all salts) — the token blocks are few
      // and fat (8 colors × ~n/8 here), so the unsalted join would run
      // on 8 tasks regardless of cluster width; salting splits each
      // block's pair generation across 128 tasks with the compare
      // count unchanged. Distances use the THRESHOLDED levenshtein
      // (early-abandon banded DP — O(len·k) per pair instead of
      // O(len²), and most pairs abandon immediately), then two-phase
      // count. Finer blocking (more tokens, length bands) is the dial
      // when block populations grow faster than the salt width.
      val salts = 16
      val p = load(s, dir, "part")
        .select($"p_partkey", $"p_name", split($"p_name", " ")(0).as("blk"))
      // spread the PROBE side before the broadcast join: the dim
      // fixture is a single row-group, so without this every residual
      // evaluation (50M levenshtein calls at sf0.1) lands in ONE task
      // (measured 62 s → 2.9 s; same single-file trap as docTokens)
      // explicit partition COUNT: a by-column repartition of a few
      // thousand tiny rows is AQE-coalesced back to one partition —
      // the row count is meaningless here, the residual work per row
      // (block-population levenshtein calls) is what needs spreading
      val a = p.withColumn("salt", pmod(xxhash64($"p_partkey"), lit(salts)))
        .repartition(128, col("blk"), col("salt"))
      val b = p.withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      a.as("a").join(b.as("b"),
          col("a.blk") === col("b.blk") && col("a.salt") === col("b.salt") &&
            col("a.p_partkey") < col("b.p_partkey") &&
            // redundant given distance <= 3 (edit distance >= length
            // gap) but evaluated FIRST: a one-instruction short-circuit
            // before the DP call on every candidate
            abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 3)
        .select(col("a.blk").as("blk"),
          levenshtein(col("a.p_name"), col("b.p_name"), 3).cast("long").as("distance"))
        .filter($"distance" >= 0)
        .groupBy($"blk", $"distance").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"blk", $"distance")
    },

    entry(
      "join_asof_nearest",
      """SELECT p_id, user_id, v_id, delta_us, dir FROM (
        |  SELECT p.event_id AS p_id, p.user_id AS user_id, v.event_id AS v_id,
        |    abs(epoch_us(v.ts) - epoch_us(p.ts)) AS delta_us,
        |    CASE WHEN v.ts <= p.ts THEN 'b' ELSE 'f' END AS dir,
        |    row_number() OVER (PARTITION BY p.event_id ORDER BY
        |      abs(epoch_us(v.ts) - epoch_us(p.ts)),
        |      CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
        |      CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END) AS rn
        |  FROM events p JOIN events v ON v.user_id = p.user_id
        |  WHERE p.event_type = 'purchase' AND v.event_type = 'view') t
        |WHERE rn = 1 ORDER BY p_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Nearest-event join (both directions) — the sensor-alignment /
      // attribution sibling of join_asof: each purchase pairs with its
      // CLOSEST view in time, backward preferred on exact ties. Same
      // scale-safe device as join_asof, applied twice over ONE
      // user-partitioned sort: carry the latest view forward AND the
      // next view backward with frame windows, then a per-row 2-way
      // min — one linear shuffle on user_id, O(events) state, never
      // the views×purchases range join the oracle states. Tie
      // conventions (same-ts views count backward with max event_id;
      // forward picks the earliest later view, min event_id) fall out
      // of the (ts, kind, event_id) sort with view-kind 0 < purchase 1.
      val ev = loadEvents(s, dir).filter($"event_type".isin("view", "purchase"))
      val tagged = ev.select($"event_id", $"user_id", unix_micros($"ts").as("tsu"),
        when($"event_type" === "view", 0).otherwise(1).as("kind"),
        when($"event_type" === "view", $"event_id").as("v_event"),
        when($"event_type" === "view", unix_micros($"ts")).as("v_tsu"))
      val base = Window.partitionBy($"user_id").orderBy($"tsu", $"kind", $"event_id")
      val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      tagged
        .withColumn("bv", last($"v_event", ignoreNulls = true).over(wB))
        .withColumn("bt", last($"v_tsu", ignoreNulls = true).over(wB))
        .withColumn("fv", first($"v_event", ignoreNulls = true).over(wF))
        .withColumn("ft", first($"v_tsu", ignoreNulls = true).over(wF))
        .filter($"kind" === 1 && ($"bv".isNotNull || $"fv".isNotNull))
        .withColumn("bd", $"tsu" - $"bt")
        .withColumn("fd", $"ft" - $"tsu")
        .withColumn("takeB", $"bv".isNotNull && ($"fv".isNull || $"bd" <= $"fd"))
        .select($"event_id".as("p_id"), $"user_id",
          when($"takeB", $"bv").otherwise($"fv").as("v_id"),
          when($"takeB", $"bd").otherwise($"fd").as("delta_us"),
          when($"takeB", lit("b")).otherwise(lit("f")).as("dir"))
        .orderBy($"p_id")
    },

    // TPC-H Q5-shaped star join; Catalyst broadcast-joins the dim chain and
    // reorders — no manual scheduling (SURVEY.md §4.2).
    entry(
      "join_multiway_star",
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM region
        |JOIN nation  ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders  ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "region").filter($"r_name" === "ASIA")
        .join(load(s, dir, "nation"), $"n_regionkey" === $"r_regionkey")
        .join(load(s, dir, "customer"), $"c_nationkey" === $"n_nationkey")
        .join(load(s, dir, "orders")
          .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
            $"o_orderdate" < to_timestamp(lit("1998-01-01"))),
          $"o_custkey" === $"c_custkey")
        .join(load(s, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .orderBy($"n_name")
    },

    entry(
      "q5_local_supplier",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q5 shape (local-supplier volume): the 6-table composite
      // that exercises the planner end to end — region/nation prune the
      // customer side, the date filter prunes orders at the scan, and
      // the LOCAL-supplier constraint (s_nationkey = c_nationkey) rides
      // the supplier equi-join as a residual, correlating the customer
      // and supplier dimensions through the fact. Plan shape at scale:
      // every dimension chain broadcasts (region→nation→customer stays
      // dim-sized after the region filter); the one real shuffle is
      // orders⋈lineitem on the order key (AQE broadcasts orders at gate
      // SFs); the nation-sized aggregate ranks by rounded revenue with
      // a name tie-break.
      load(s, dir, "region").filter($"r_name" === "ASIA")
        .join(load(s, dir, "nation"), $"n_regionkey" === $"r_regionkey")
        .join(load(s, dir, "customer"), $"c_nationkey" === $"n_nationkey")
        .join(load(s, dir, "orders")
          .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
            $"o_orderdate" < to_timestamp(lit("1997-01-01"))),
          $"o_custkey" === $"c_custkey")
        .join(load(s, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
        .join(load(s, dir, "supplier"),
          $"s_suppkey" === $"l_suppkey" && $"s_nationkey" === $"c_nationkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },

    entry(
      "q3_shipping_priority",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q3 shape (shipping priority): unshipped revenue for one
      // market segment — the classic selective-dimension star probe.
      // Plan shape at scale: the segment filter keeps customer
      // dim-sized (1/5 of customers) → broadcast into orders; the date
      // filters are pushed into both fact scans (PushedFilters on
      // o_orderdate / l_shipdate prune row groups BEFORE the join);
      // the one real shuffle is the order-key aggregate, and the final
      // top-10 is TakeOrderedAndProject — per-partition heaps, never a
      // global sort.
      val cust = load(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val ord = load(s, dir, "orders")
        .filter($"o_orderdate" < to_timestamp(lit("1997-01-01")))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
      val li = load(s, dir, "lineitem")
        .filter($"l_shipdate" > to_timestamp(lit("1997-01-01")))
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(li, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          $"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .select($"l_orderkey", $"revenue", $"orderdate", $"o_orderpriority")
        .orderBy($"revenue".desc, $"l_orderkey").limit(10)
    },

    entry(
      "q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey AS bkey, round(sum(l_quantity), 4) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(o_totalprice, 4) AS totalprice, sum_qty
        |FROM big JOIN orders ON o_orderkey = bkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q18 shape (large-volume customer): find the extreme-tail
      // orders by total quantity, then decorate with order + customer
      // attributes. The scale device is aggregate-THEN-broadcast: the
      // quantity aggregate runs once over the fact (map-side partial
      // sums, one shuffle on the order key), the HAVING filter cuts it
      // to the top ~0.5% tail, and that tiny survivor set broadcasts
      // into orders and then customer — neither dimension table is
      // shuffled at all, and lineitem is scanned exactly once (TPC-H's
      // textbook formulation re-scans it inside an IN-subquery).
      // r18: the quantity aggregate rides the l_orderkey-bucketed lake
      // layout — its one fact exchange (~147 k partial rows at sf0.1)
      // disappears; the broadcast decoration chain is unchanged.
      val big = FactLayout.byOrderkey(s, dir)
        .groupBy($"l_orderkey".as("bkey"))
        .agg(round(sum($"l_quantity"), 4).as("sum_qty"))
        .filter($"sum_qty" > 300)
      val qual = load(s, dir, "orders")
        .join(broadcast(big), $"o_orderkey" === $"bkey")
      load(s, dir, "customer").join(broadcast(qual), $"c_custkey" === $"o_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
          round($"o_totalprice", 4).as("totalprice"), $"sum_qty")
        .orderBy($"totalprice".desc, $"o_orderkey").limit(100)
    },

    entry(
      "q4_priority_check",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q4 shape (order-priority check): EXISTS over the fact,
      // expressed as a LEFT SEMI join — Spark never materializes the
      // match side, it just probes for presence and short-circuits on
      // the first hit. Both date bounds are pushed into the orders
      // scan (row-group pruning BEFORE the join); the semi join
      // shuffles only (orderkey) pairs, and the returnflag filter cuts
      // the probe side to a third before the exchange.
      val ord = load(s, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1999-01-01")) &&
          $"o_orderdate" < to_timestamp(lit("1999-07-01")))
      val ret = load(s, dir, "lineitem")
        .filter($"l_returnflag" === "R").select($"l_orderkey")
      ord.join(ret, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    entry(
      "q13_customer_distribution",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q13 shape (customer order distribution): how many
      // customers placed k orders, zeros included. The textbook form
      // left-joins the full fact to the dimension and THEN aggregates
      // — at scale that exchange carries every order row. Aggregating
      // orders FIRST collapses the fact to one row per customer before
      // any join; the left join then only fills the zero bucket, and
      // the second aggregate is over |customers| rows. Same answer,
      // one fact-sized shuffle instead of two.
      val cnt = load(s, dir, "orders")
        .filter($"o_orderpriority" =!= "1-URGENT")
        .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
      load(s, dir, "customer")
        .join(cnt, $"c_custkey" === $"o_custkey", "left")
        .select(coalesce($"cnt", lit(0L)).as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    entry(
      "q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey AS skey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
        |      AS BIGINT) AS rev_micro
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |    AND l_shipdate < TIMESTAMP '2000-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(rev_micro) AS m FROM rev)
        |SELECT s_suppkey, s_name, round(rev_micro / 10000.0, 4) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = skey JOIN mx ON rev_micro = m
        |ORDER BY s_suppkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q15 shape (top supplier): argmax over a grouped revenue
      // aggregate, ties kept. The revenue is accumulated in exact
      // integer micro-units (each line's discounted price rounds to
      // 1e-4 BEFORE summing — term-level rounding is order-independent,
      // so the argmax decision is exact and engine-portable; summing
      // doubles first could flip a near-tie between engines). Plan: one
      // fact shuffle to supplier grain, a 1-row max broadcast joined
      // back by equality (BroadcastHashJoin, not a rank sort), winners
      // broadcast into the supplier dim.
      val rev = load(s, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("2000-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("2000-04-01")))
        .groupBy($"l_suppkey".as("skey"))
        .agg(sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("long")).as("rev_micro"))
      val mx = rev.agg(max($"rev_micro").as("m"))
      val winners = rev.join(broadcast(mx), $"rev_micro" === $"m")
      load(s, dir, "supplier")
        .join(broadcast(winners), $"s_suppkey" === $"skey")
        .select($"s_suppkey", $"s_name",
          round($"rev_micro" / 10000.0, 4).as("total_rev"))
        .orderBy($"s_suppkey")
    },

    entry(
      "q17_small_quantity",
      """WITH st AS (
        |  SELECT l_partkey AS pk, sum(l_quantity) AS sq, count(*) AS cnt
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#3' GROUP BY 1)
        |SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN st ON pk = l_partkey
        |WHERE p_brand = 'Brand#3' AND 5 * l_quantity * cnt < sq""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q17 shape (small-quantity revenue): lines below 20% of
      // their part's average quantity. The correlated AVG subquery is
      // decorrelated by hand: filter the part dim to the brand FIRST
      // (broadcast, so the per-part stats aggregate only ever sees the
      // brand's 1/25 slice of the fact), then broadcast the tiny stats
      // frame back. The threshold l_quantity < 0.2·avg is evaluated as
      // 5·qty·cnt < sum — quantities are integer-valued, so the
      // comparison is exact in both engines; a double 0.2·(sum/count)
      // could disagree at the boundary.
      val pf = load(s, dir, "part")
        .filter($"p_brand" === "Brand#3").select($"p_partkey")
      // r18: the brand slice rides the l_partkey-bucketed lake layout,
      // so the per-part stats aggregate plans without its exchange
      val li = FactLayout.byPartkey(s, dir)
        .join(broadcast(pf), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val st = li.groupBy($"l_partkey".as("pk"))
        .agg(sum($"l_quantity").as("sq"), count(lit(1)).as("cnt"))
      li.join(broadcast(st), $"l_partkey" === $"pk")
        .filter(lit(5) * $"l_quantity" * $"cnt" < $"sq")
        .agg(round(sum($"l_extendedprice") / 7.0, 4).as("avg_yearly"))
    },

    entry(
      "q21_lone_blame",
      """WITH ps AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
        |  FROM lineitem GROUP BY 1, 2),
        |po AS (SELECT ok, count(*) AS nsupp, sum(ret) AS nret
        |       FROM ps GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM ps JOIN po USING (ok) JOIN supplier ON s_suppkey = sk
        |WHERE ret = 1 AND nsupp > 1 AND nret = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q21 shape (suppliers who kept waiting): the supplier
      // solely to blame in multi-supplier orders — the textbook form is
      // EXISTS + NOT EXISTS self-joins over the fact, three row-level
      // lineitem⋈lineitem probes. Re-expressed as a two-level
      // aggregation: collapse to (order, supplier) pairs with a
      // returned-flag max (one fact shuffle), roll those up per order
      // (pairs frame is orders-sized), and the "only culprit" test
      // becomes nsupp > 1 AND nret = 1 — no self-join ever touches
      // row-level data, so a skewed mega-order can't explode a probe.
      // r18: the fact comes from the l_orderkey-BUCKETED lake layout
      // (FactLayout.byOrderkey) — HashPartitioning(l_orderkey) from the
      // bucketed scan satisfies the groupBy's ClusteredDistribution(ok,
      // sk), so the pair aggregate plans WITHOUT an exchange, and the
      // rollup + the ps⋈po join inherit the partitioning (guide §2.4).
      // The r16/r17 localCheckpoint device is deliberately GONE: it
      // existed so the fact groupBy would SHUFFLE once, not once per
      // branch, but a checkpoint materializes as
      // UnknownPartitioning(0) (measured: the rollup re-exchanged
      // ~148 k post-agg rows through it) — with the bucketed scan
      // there is no fact shuffle to dedup, so each branch recomputes
      // the exchange-free scan+agg instead (two scans of the 4-column
      // bucketed projection; zero corpus-sized exchanges anywhere).
      // Raw-scan plan: 1,038,695 shuffle records on this entry.
      val ps = FactLayout.byOrderkey(s, dir)
        .groupBy($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
        .agg(max(when($"l_returnflag" === "R", 1).otherwise(0)).as("ret"))
      val po = ps.groupBy($"ok")
        .agg(count(lit(1)).as("nsupp"), sum($"ret").as("nret"))
      ps.filter($"ret" === 1)
        .join(po.filter($"nsupp" > 1 && $"nret" === 1), "ok")
        .join(broadcast(load(s, dir, "supplier")), $"s_suppkey" === $"sk")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name").limit(20)
    },

    entry(
      "q22_dormant_balance",
      """WITH a AS (SELECT round(avg(c_acctbal), 4) AS ab
        |           FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name, count(*) AS numcust,
        |  round(sum(c_acctbal), 4) AS totacctbal
        |FROM customer JOIN nation ON n_nationkey = c_nationkey CROSS JOIN a
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-08-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q22 shape (global sales opportunity): above-average-
      // balance customers gone quiet — scalar AVG subquery + NOT
      // EXISTS, grouped by nation. The average is a 1-row broadcast
      // (rounded to 4dp so the threshold is engine-portable); the NOT
      // EXISTS is a LEFT ANTI join whose probe side is date-pruned at
      // the orders scan before the exchange. Nation is a broadcast dim.
      // Every customer here has SOME order, so the anti join's
      // selectivity comes entirely from the pushed date bound.
      val cust = load(s, dir, "customer")
      val a = cust.filter($"c_acctbal" > 0.0)
        .agg(round(avg($"c_acctbal"), 4).as("ab"))
      val recent = load(s, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("2000-08-01")))
        .select($"o_custkey")
      cust.crossJoin(broadcast(a))
        .filter($"c_acctbal" > $"ab")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .join(broadcast(load(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("numcust"),
          round(sum($"c_acctbal"), 4).as("totacctbal"))
        .orderBy($"n_name")
    },

    entry(
      "q6_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q6 shape (forecasting revenue change): the pure
      // scan-filter-aggregate — no join at all. Its entire 100 TB story
      // is pushdown: all four predicates reach the parquet scan
      // (PushedFilters prunes row groups on shipdate min/max before a
      // byte of the page decodes), and the aggregate is a map-side
      // partial + one 1-row exchange.
      load(s, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1998-01-01")) &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    entry(
      "q7_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year,
        |  round(rev_micro / 10000.0, 4) AS revenue FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |  GROUP BY 1, 2, 3) ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q7 shape (volume shipping): bilateral trade flows between
      // two nations by year. The OR couples the two nation roles, but
      // each role independently must be one of the pair — so both dim
      // chains are PRE-FILTERED to the 2-nation slice (supplier and
      // customer shrink ~12×, broadcast into the facts) and the
      // cross-coupling OR evaluates as a cheap residual on the joined
      // rows. The one fact-fact exchange is lineitem ⋈ orders on the
      // order key; revenue accumulates in exact integer micro-units.
      val pair = Seq("NATION_3", "NATION_7")
      val nat = load(s, dir, "nation").filter($"n_name".isin(pair: _*))
      val sup = load(s, dir, "supplier")
        .join(broadcast(nat.select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"snk")
        .select($"s_suppkey", $"supp_nation")
      val cust = load(s, dir, "customer")
        .join(broadcast(nat.select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))),
          $"c_nationkey" === $"cnk")
        .select($"c_custkey", $"cust_nation")
      load(s, dir, "lineitem")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(load(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
          ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("long")).as("rev_micro"))
        .select($"supp_nation", $"cust_nation", $"l_year",
          round($"rev_micro" / 10000.0, 4).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },

    entry(
      "q8_market_share",
      """SELECT o_year, round(100.0 * nat_micro / total_micro, 4) AS mkt_share_pct
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS nat_micro,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS BIGINT) AS total_micro
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |  GROUP BY 1) ORDER BY o_year""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q8 shape (national market share): one supplier nation's
      // share of a region's revenue by year — the conditional-ratio
      // aggregate. Share numerator and denominator accumulate in the
      // SAME pass as exact integer micro-units (a CASE inside the sum,
      // no second scan, no join back), so the final division is
      // exact-long / exact-long — bit-identical across engines, where a
      // ratio of two independently-rounded double sums could wobble.
      // Customer dim chain (nation ⋈ region filter) broadcasts; the
      // fact-fact exchange is lineitem ⋈ orders.
      val cnat = load(s, dir, "nation")
        .join(broadcast(load(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cnk"))
      val cust = load(s, dir, "customer")
        .join(broadcast(cnat), $"c_nationkey" === $"cnk").select($"c_custkey")
      val snat = load(s, dir, "nation")
        .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
      val sup = load(s, dir, "supplier")
        .join(broadcast(snat), $"s_nationkey" === $"snk")
        .select($"s_suppkey", $"supp_nation")
      val micro = round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
        .cast("long")
      load(s, dir, "lineitem")
        .join(load(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(sum(when($"supp_nation" === "NATION_3", micro).otherwise(0L)).as("nat_micro"),
          sum(micro).as("total_micro"))
        .select($"o_year",
          round(lit(100.0) * $"nat_micro" / $"total_micro", 4).as("mkt_share_pct"))
        .orderBy($"o_year")
    },

    entry(
      "q9_product_profit",
      """SELECT n_name, o_year, round(profit_micro / 10000.0, 4) AS profit FROM (
        |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
        |      - 0.6 * p_retailprice * l_quantity) * 10000) AS BIGINT)) AS BIGINT)
        |      AS profit_micro
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2) ORDER BY n_name, o_year""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q9 shape (product-type profit): revenue minus modeled
      // supply cost (0.6 · retail price · quantity stands in for the
      // absent partsupp.ps_supplycost), cube'd by supplier nation ×
      // order year. Three broadcast dims (part for cost, supplier →
      // nation for the group key) ride the lineitem scan; the only
      // fact-fact exchange is the order-year decoration. Profit can go
      // NEGATIVE — per-line rounding to micro before the sum keeps the
      // aggregation exact and order-independent in both engines (both
      // round() halves away from zero).
      val sup = load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation")), $"n_nationkey" === $"s_nationkey")
        .select($"s_suppkey", $"n_name")
      val profit = round(($"l_extendedprice" * (lit(1) - $"l_discount") -
        lit(0.6) * $"p_retailprice" * $"l_quantity") * 10000).cast("long")
      load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "part").select($"p_partkey", $"p_retailprice")),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(load(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name", year($"o_orderdate").cast("long").as("o_year"))
        .agg(sum(profit).as("profit_micro"))
        .select($"n_name", $"o_year",
          round($"profit_micro" / 10000.0, 4).as("profit"))
        .orderBy($"n_name", $"o_year")
    },

    entry(
      "q10_returned_items",
      """WITH r AS (
        |  SELECT c_custkey, c_name, n_name,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM customer
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1999-10-01'
        |    AND o_orderdate < TIMESTAMP '2000-01-01'
        |  GROUP BY 1, 2, 3)
        |SELECT c_custkey, c_name, n_name, round(rev_micro / 10000.0, 4) AS revenue
        |FROM r ORDER BY rev_micro DESC, c_custkey LIMIT 20""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q10 shape (returned-item reporting): which customers
      // returned the most revenue last quarter. Filters push into both
      // fact scans (returnflag on lineitem, the quarter on orders); the
      // fact-fact exchange shuffles only the filtered slices; nation
      // broadcasts onto the customer-grain aggregate. The top-20 ranks
      // on the EXACT integer micro revenue (tie-broken by key), so the
      // cut line can't move with summation order, and lowers to
      // TakeOrderedAndProject.
      val ord = load(s, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1999-10-01")) &&
          $"o_orderdate" < to_timestamp(lit("2000-01-01")))
        .select($"o_orderkey", $"o_custkey")
      val li = load(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val nat = load(s, dir, "nation").select($"n_nationkey", $"n_name")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("long")).as("rev_micro"))
        .orderBy($"rev_micro".desc, $"c_custkey").limit(20)
        .select($"c_custkey", $"c_name", $"n_name",
          round($"rev_micro" / 10000.0, 4).as("revenue"))
    },

    entry(
      "q14_promo_share",
      """SELECT round(100.0 * promo_micro / total_micro, 4) AS promo_share_pct FROM (
        |  SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS promo_micro,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS BIGINT) AS total_micro
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1998-03-01'
        |    AND l_shipdate < TIMESTAMP '1998-04-01')""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q14 shape (promotion effect): promo revenue share for one
      // month — numerator and denominator in ONE conditional aggregate
      // pass (exact integer micro-units; same device as q8), with the
      // month pushed into the lineitem scan and the part type dim
      // broadcast.
      val micro = round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
        .cast("long")
      load(s, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1998-03-01")) &&
          $"l_shipdate" < to_timestamp(lit("1998-04-01")))
        .join(broadcast(load(s, dir, "part").select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .agg(sum(when($"p_type" === "PROMO", micro).otherwise(0L)).as("promo_micro"),
          sum(micro).as("total_micro"))
        .select(round(lit(100.0) * $"promo_micro" / $"total_micro", 4)
          .as("promo_share_pct"))
    },

    entry(
      "q19_disjunctive_pricing",
      """SELECT round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) / 10000.0, 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 1 AND l_quantity <= 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
        |       AND l_quantity >= 20 AND l_quantity <= 45)""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q19 shape (discounted revenue, disjunctive predicate):
      // three brand/size/quantity bands OR'd together — the classic
      // optimizer test for predicates that straddle a join. The
      // single-table halves ARE separable: Catalyst pushes the derived
      // quantity envelope (1..45) into the lineitem scan and the
      // brand/size envelope into the part dim before the broadcast
      // join; the full disjunction then evaluates as the join residual.
      val bands =
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
          $"l_quantity" >= 1 && $"l_quantity" <= 15) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(10, 25) &&
          $"l_quantity" >= 10 && $"l_quantity" <= 30) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(20, 40) &&
          $"l_quantity" >= 20 && $"l_quantity" <= 45)
      load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .filter(bands)
        .agg(round(sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
            .cast("long")) / 10000.0, 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    entry(
      "q12_shipping_pivot",
      """SELECT l_returnflag AS mode_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1999-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q12 plan shape, adapted to the fixture's columns (r12
      // verdict ask #8 — the real Q12 needs l_shipmode/l_commitdate/
      // l_receiptdate, which this lineitem does not carry): a fact-fact
      // equijoin on the order key whose residual is a DATE-WINDOW
      // relation between the two tables' date columns (lines shipped
      // ≥60 days after their order — the "late shipping" audit), then
      // the Q12 CASE-PIVOT: one hash aggregate producing BOTH priority
      // counts as conditional sums, never two scans or a pivot shuffle.
      // The absolute year bounds push into the lineitem scan
      // (row-group pruning before the join); the cross-table window
      // stays a join residual — exactly where an optimizer must leave
      // it. PlanAuditSpec pins the pushed scan bounds + single-agg
      // shape.
      val li = load(s, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1999-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("2000-01-01")))
        .select($"l_orderkey", $"l_shipdate", $"l_returnflag")
      val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      load(s, dir, "orders")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .join(li, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"l_returnflag".as("mode_class"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_count"))
        .orderBy($"mode_class")
    },

    entry(
      "q16_supplier_variety",
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'STANDARD%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q16 plan shape, adapted (r12 verdict ask #8 — the real
      // Q16 reads partsupp, absent from the fixture; DISTINCT
      // (l_partkey, l_suppkey) from lineitem is the same part↔supplier
      // relation): supplier variety per (brand, size) for the
      // qualifying part classes, EXCLUDING flagged suppliers. The
      // Q16 plan idioms exercised: (1) the NOT-IN subquery lowers to a
      // broadcast LEFT ANTI join (s_suppkey is non-null by schema, so
      // NOT IN ≡ anti join — with nullable keys NOT IN needs
      // null-aware anti semantics, which is why the declared form
      // keeps the key non-null); (2) the negated/IN-list part
      // predicates filter the DIMENSION before its broadcast, so the
      // join build side is pre-pruned; (3) the two-phase hash distinct
      // collapses the triple grain map-side before its one exchange.
      // Exchange-order rewrite (optimization round, guide §2.3 —
      // filter and project BEFORE the shuffle): the declared answer
      // only needs DISTINCT (p_brand, p_size, l_suppkey) triples —
      // supplier_cnt groups by (brand, size) and counts distinct
      // suppliers, and brand/size are functions of l_partkey — so the
      // part dimension (pre-pruned, broadcast) and the bad-supplier
      // anti join both apply MAP-SIDE on the raw fact, the partkey is
      // dropped, and the one exchange carries the partially-collapsed
      // triple distinct (bounded by brands × sizes × suppliers per map
      // task) instead of the full part↔supplier pair relation. The
      // previous shape (pair distinct first, dimension join after)
      // shuffled ~5× the records to build a relation the query never
      // returns. count(*) over the distinct triples ≡ the former
      // count(DISTINCT l_suppkey): same set, one fewer aggregate
      // expansion.
      val bad = load(s, dir, "supplier")
        .filter($"s_acctbal" < 0).select($"s_suppkey")
      val pt = load(s, dir, "part")
        .filter($"p_brand" =!= "Brand#4" &&
          !$"p_type".startsWith("STANDARD") &&
          $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
        .select($"p_partkey", $"p_brand", $"p_size")
      load(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey")
        .join(broadcast(pt), $"l_partkey" === $"p_partkey")
        .join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
        .select($"p_brand", $"p_size", $"l_suppkey").distinct()
        .groupBy($"p_brand", $"p_size")
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
    },

    entry(
      "q2_min_cost_supplier",
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
        |        // CAST(l_quantity AS BIGINT)) AS uc
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'),
        |c AS (SELECT l_partkey, uc, s_name, s_acctbal, n_name
        |  FROM ps JOIN eu ON s_suppkey = l_suppkey),
        |m AS (SELECT l_partkey, min(uc) AS mc FROM c GROUP BY 1)
        |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        |  c.l_partkey AS p_partkey, p_name, CAST(c.uc AS BIGINT) AS unit_cost_micro
        |FROM c JOIN m ON c.l_partkey = m.l_partkey AND c.uc = m.mc
        |JOIN part ON p_partkey = c.l_partkey
        |WHERE p_size <= 10
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q2 plan shape, adapted (the real Q2 reads partsupp;
      // DISTINCT-aggregated lineitem is the part↔supplier bridge, its
      // min observed unit price the ps_supplycost stand-in): for each
      // small part, the EUROPE supplier(s) offering the minimum unit
      // cost. The Q2 idiom under test is the CORRELATED SCALAR SUBQUERY
      // (cost = min cost for this part among the region's suppliers)
      // decorrelated into an aggregate + equality join-back — argmin
      // per group without a window sort — under a supplier→nation→
      // region dim chain (region filter prunes the chain BEFORE the
      // bridge join) and a top-20 TakeOrderedAndProject. Unit costs in
      // exact integer micro-units (cents × 10⁴ DIV integral quantity),
      // so the min and the equality join-back are bit-portable; ties
      // keep every minimal supplier, as Q2's does.
      // r18: the fact comes from the l_partkey-BUCKETED lake layout
      // (FactLayout.byPartkey) — the bucketed scan's HashPartitioning
      // satisfies the pair groupBy, survives the broadcast eu join and
      // the checkpoint, and co-partitions the argmin join-back (guide
      // §2.4); the raw-scan plan had this entry at 697,983 records.
      val ps = FactLayout.byPartkey(s, dir)
        .filter($"l_quantity" > 0)
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min((round($"l_extendedprice" * 100).cast("long") * 10000L)
          .divide($"l_quantity".cast("long")).cast("long")).as("uc"))
      val eu = load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation")), $"n_nationkey" === $"s_nationkey")
        .join(broadcast(load(s, dir, "region")
          .filter($"r_name" === "EUROPE")), $"r_regionkey" === $"n_regionkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      // c feeds TWO branches (the argmin rollup and the equality
      // join-back). The r16/r17 localCheckpoint device is GONE for the
      // same reason as q21's: a checkpoint materializes as
      // UnknownPartitioning(0), re-introducing exchanges the bucketed
      // scan just removed — recomputing the exchange-free scan + agg +
      // broadcast-eu join per branch keeps BOTH branches shuffle-free
      // and co-partitioned on l_partkey for the argmin join-back.
      val c = ps.join(broadcast(eu), $"s_suppkey" === $"l_suppkey")
        .select($"l_partkey", $"uc", $"s_name", $"s_acctbal", $"n_name")
      val m = c.groupBy($"l_partkey".as("m_part")).agg(min($"uc").as("mc"))
      // join-back on the PART KEY ONLY, with the min-test as a RANGE
      // residual: uc <= mc ⟺ uc = mc (mc is min(uc) over the same
      // frame, so uc < mc is impossible). As a second equi-key the
      // min-test would defeat bucket co-partitioning — joins require
      // ALL cluster keys co-partitioned
      // (spark.sql.requireAllClusterKeysForCoPartition, default true),
      // so (l_partkey, uc) keys re-exchanged BOTH sides (measured:
      // 138,528 recs vs 43,269); a range predicate stays residual and
      // the single-key join rides the bucketed partitioning.
      c.join(m, $"l_partkey" === $"m_part" && $"uc" <= $"mc")
        .join(broadcast(load(s, dir, "part").filter($"p_size" <= 10)
          .select($"p_partkey", $"p_name")), $"p_partkey" === $"l_partkey")
        .select(round($"s_acctbal", 2).as("s_acctbal"), $"s_name", $"n_name",
          $"l_partkey".as("p_partkey"), $"p_name", $"uc".as("unit_cost_micro"))
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(20)
    },

    entry(
      "q11_important_stock",
      """WITH v AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
        |      AS BIGINT) AS val
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_8') GROUP BY 1),
        |t AS (SELECT sum(val) AS tot FROM v)
        |SELECT l_partkey AS p_partkey, val AS value_micro
        |FROM v, t WHERE val * 1000 > tot
        |ORDER BY val DESC, l_partkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q11 plan shape, adapted (real Q11 sums partsupp stock
      // value; discounted lineitem revenue through the two target
      // nations' suppliers is the value surface): parts whose value
      // share exceeds the Q11-style GLOBAL-FRACTION threshold
      // (> 1/1000 of the total). The idiom under test: a HAVING
      // against a scalar aggregate OF THE SAME grouped frame — the
      // per-part aggregate feeds both the filter's left side and (via
      // a 1-row broadcast crossJoin) the threshold, one grouped pass,
      // no second fact scan. Exact integer micro-revenue makes the
      // share test val·1000 > tot bit-portable.
      val v = load(s, dir, "lineitem")
        .join(broadcast(load(s, dir, "supplier")), $"s_suppkey" === $"l_suppkey")
        .join(broadcast(load(s, dir, "nation")
          .filter($"n_name".isin("NATION_3", "NATION_8"))),
          $"n_nationkey" === $"s_nationkey")
        .groupBy($"l_partkey")
        .agg(sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("long")).as("val"))
      val t = v.agg(sum($"val").as("tot"))
      v.crossJoin(broadcast(t))
        .filter($"val" * 1000 > $"tot")
        .select($"l_partkey".as("p_partkey"), $"val".as("value_micro"))
        .orderBy($"val".desc, $"p_partkey")
    },

    entry(
      "q20_concentrated_suppliers",
      """WITH pq AS (SELECT l_partkey, l_suppkey,
        |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01'
        |      AND l_shipdate < TIMESTAMP '2000-01-01'
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS q99,
        |    sum(CAST(l_quantity AS BIGINT)) AS qall
        |  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
        |  GROUP BY 1, 2),
        |sel AS (SELECT DISTINCT l_suppkey FROM pq WHERE 2 * q99 > qall)
        |SELECT s_name, round(s_acctbal, 2) AS s_acctbal, n_name
        |FROM supplier JOIN sel ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_6')
        |ORDER BY s_name""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // TPC-H Q20 plan shape, adapted (real Q20 compares partsupp
      // availability against a year's shipped volume; here the same
      // NESTED SEMI-JOIN CHAIN asks which suppliers CONCENTRATED their
      // shipping of pattern-matched parts into 1999 — more than half
      // of their all-time quantity): part-name LIKE filter pre-prunes
      // the bridge (pushed to the dim before its broadcast), one
      // (part, supplier) aggregate computes BOTH the windowed and
      // all-time quantities as conditional sums in a single pass (no
      // second fact scan — the Q20 textbook form pays two), the
      // qualifying supplier set collapses to a DISTINCT key frame, and
      // the outer query is a SEMI-shaped equality join into the
      // supplier dim under a nation filter. Integer quantities make
      // the 2·q99 > qall test exact.
      // r18: the conditional-sum aggregate rides the l_partkey-bucketed
      // lake layout (broadcast part filter applies map-side, the
      // partitioning survives it) — its fact exchange (~77 k partial
      // rows at sf0.1) disappears.
      val pq = FactLayout.byPartkey(s, dir)
        .join(broadcast(load(s, dir, "part")
          .filter($"p_name".contains("red")).select($"p_partkey")),
          $"p_partkey" === $"l_partkey")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum(when($"l_shipdate" >= to_timestamp(lit("1999-01-01")) &&
              $"l_shipdate" < to_timestamp(lit("2000-01-01")),
              $"l_quantity".cast("long")).otherwise(0L)).as("q99"),
          sum($"l_quantity".cast("long")).as("qall"))
      val sel = pq.filter(lit(2) * $"q99" > $"qall")
        .select($"l_suppkey").distinct()
      load(s, dir, "supplier")
        .join(sel, $"s_suppkey" === $"l_suppkey")
        .join(broadcast(load(s, dir, "nation")
          .filter($"n_name".isin("NATION_1", "NATION_6"))),
          $"n_nationkey" === $"s_nationkey")
        .select($"s_name", round($"s_acctbal", 2).as("s_acctbal"), $"n_name")
        .orderBy($"s_name")
    }
  )

  // ---- §2.5 aggregation -------------------------------------------------

  val aggs: Seq[Entry] = Seq(
    entry(
      "agg_global",
      """SELECT count(*) AS n_rows, round(sum(l_quantity),4) AS sum_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(min(l_extendedprice),4) AS min_price,
        |  round(max(l_extendedprice),4) AS max_price
        |FROM lineitem""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(min($"l_extendedprice"), 4).as("min_price"),
        round(max($"l_extendedprice"), 4).as("max_price"))
    },

    entry(
      "agg_weighted_median",
      """WITH g AS (SELECT l_returnflag, l_extendedprice AS p,
        |    CAST(sum(l_quantity) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, p, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tw FROM g)
        |SELECT l_returnflag, round(min(p), 4) AS wmedian,
        |  CAST(min(tw) AS BIGINT) AS total_weight
        |FROM c WHERE 2 * cw >= tw
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // WEIGHTED median — the order statistic metrics pipelines need
      // when rows carry unequal mass (here: price weighted by shipped
      // quantity — "the price at which half the VOLUME moved", which
      // plain median-of-rows misstates whenever quantity correlates
      // with price). Definition: smallest value whose cumulative weight
      // reaches half the total — integer-exact end to end (quantities
      // are integral longs, the crossing test is 2·cw ≥ tw in longs),
      // so both engines pick the identical crossing row.
      //
      // Scale shape (r13 verdict ask #1 — the lake dial, WIRED): the
      // heavy reduction is the (flag, price) GROUP BY — a two-phase
      // hash aggregate over the fact with map-side combine. The
      // cumulative weight then uses the two-level bucket prefix-sum
      // (win_ntile_global's device): prices are near-unique, so the
      // distinct-price frame ≈ rows/flag, and a single per-flag window
      // would sort ~10¹¹ rows through THREE tasks at 100 TB. Instead:
      // range-bucket by 15 approximate price split points
      // (approximation only affects bucket BALANCE, never
      // correctness — bucket assignment is a pure function of price,
      // so (flag, bkt, price) ordering ≡ (flag, price) ordering), sum
      // weights per (flag, bucket) in parallel, prefix-sum the tiny
      // flag×16 bucket-totals frame, and run the in-bucket cumulative
      // window per (flag, bucket) — 16× the partitions, each 1/16 the
      // rows, global cw = bucket offset + in-bucket cw exactly as
      // before. ROWS framing pinned on both engines (prices are unique
      // within a group post-aggregate, so ROWS ≡ RANGE — pinned anyway
      // against tie-semantics drift). The crossing row via filter+min,
      // never a per-group sort-and-index on the driver.
      // g feeds three branches (split points, bucket totals, the ranked
      // frame) — localCheckpoint so the fact groupBy SHUFFLES ONCE, not
      // once per branch (3 fact shuffles measured at sf0.1; the
      // materialized frame is the already-reduced (flag, price) grain)
      // r18: the fact comes from the l_extendedprice-BUCKETED lake
      // layout (FactLayout.byPrice) — HashPartitioning(price) satisfies
      // ClusteredDistribution(flag, price), so the heavy (flag, price)
      // groupBy plans without an exchange (guide §2.4); the raw-scan
      // plan had this entry at 632,015 records, ~600 k of them here.
      val g = FactLayout.byPrice(s, dir)
        .groupBy($"l_returnflag", $"l_extendedprice")
        .agg(sum($"l_quantity".cast("long")).as("w"))
        .localCheckpoint()
      val bounds = g.agg(percentile_approx($"l_extendedprice",
        typedLit((1 to 15).map(_ / 16.0)), lit(10000)).as("bs"))
      val bucketed = g.crossJoin(broadcast(bounds))
        .select($"l_returnflag", $"l_extendedprice", $"w",
          aggregate($"bs", lit(0),
            (acc, b) => acc + when($"l_extendedprice" > b, 1).otherwise(0)).as("bkt"))
      val wOff = Window.partitionBy($"l_returnflag").orderBy($"bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy($"l_returnflag")
      // flag×16 rows: per-bucket weight, prefix offset, flag total
      val offs = bucketed.groupBy($"l_returnflag", $"bkt").agg(sum($"w").as("bw"))
        .withColumn("off", coalesce(sum($"bw").over(wOff), lit(0L)))
        .withColumn("tw", sum($"bw").over(wTot))
      // CROSSING-BUCKET PRUNE: only the one bucket per flag whose
      // cumulative-weight range straddles tw/2 can hold the crossing
      // row. Buckets below it top out under half the total (their rows
      // never satisfy 2·cw ≥ tw); buckets above hold strictly larger
      // prices than every qualifying crossing-bucket row (bkt is
      // monotone in price: p2 ≤ p1 ⇒ bkt2 ≤ bkt1), so they qualify but
      // can never move min(price), and tw is flag-constant so min(tw)
      // is unchanged. Strictness matters: when 2·off == tw the
      // crossing row is the LAST row of an earlier bucket, and THAT
      // bucket satisfies 2·(off+bw) ≥ tw ∧ 2·off < tw — exactly one
      // bucket per flag passes (an empty bucket, bw = 0, cannot).
      // Filtering the broadcast side to it drops ~15/16 of the ranked
      // frame map-side, BEFORE the in-bucket window's exchange.
      // PRECONDITION (ADVICE r17): weights are strictly positive
      // (l_quantity ≥ 1 by TPC-H construction), so tw > 0 for every
      // flag that has rows. A flag whose total weight were 0 would pass
      // no bucket here (2·off < tw unsatisfiable at tw = 0) and drop
      // from the output, while the declared SQL emits it (all rows
      // satisfy 2·cw ≥ 0) — zero-weight domains need an explicit
      // `|| tw === 0` escape before reusing this prune.
      val crossing = offs
        .filter($"off" * 2 < $"tw" && ($"off" + $"bw") * 2 >= $"tw")
        .select($"l_returnflag", $"bkt", $"off", $"tw")
      val wIn = Window.partitionBy($"l_returnflag", $"bkt").orderBy($"l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(crossing), Seq("l_returnflag", "bkt"))
        .withColumn("cw", sum($"w").over(wIn) + $"off")
        .filter($"cw" * 2 >= $"tw")
        .groupBy($"l_returnflag")
        .agg(round(min($"l_extendedprice"), 4).as("wmedian"),
          min($"tw").as("total_weight"))
        .orderBy($"l_returnflag")
    },

    entry(
      "agg_count_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS uniq_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("uniq_users"))
        .orderBy($"event_type")
    },

    // HLL sketch — differs from the exact oracle by construction → no
    // oracle; unit-tested within ±2% of exact (SURVEY.md §2.5).
    entryNoOracle("agg_approx_distinct") { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
        .orderBy($"event_type")
    },

    // remove_outliers (reference agent.py:65): two-phase mean/stddev then
    // |z| filter. Stats computed once and broadcast — no per-row subquery.
    // Runs over events.value (heavy-tailed: 496 rows past 2σ at sf0.01) —
    // lineitem prices are uniform enough that NOTHING is 2σ out, which
    // made the old form pass vacuously on 0 rows.
    entry(
      "agg_stats_zscore",
      """WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sd FROM events)
        |SELECT event_id, round((value - mu)/sd, 4) AS z
        |FROM events, s WHERE abs((value - mu)/sd) > 2
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val ev = loadEvents(s, dir)
      val stats = ev.agg(avg($"value").as("mu"),
        stddev_samp($"value").as("sd"))
      ev.crossJoin(broadcast(stats))
        .withColumn("z", ($"value" - $"mu") / $"sd")
        .filter(abs($"z") > 2)
        .select($"event_id", round($"z", 4).as("z"))
        .orderBy($"event_id")
    },

    entry(
      "agg_having",
      """SELECT c_nationkey, count(*) AS cnt FROM customer
        |GROUP BY c_nationkey HAVING count(*) >= 5 ORDER BY c_nationkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" >= 5)
        .orderBy($"c_nationkey")
    },

    entry(
      "agg_rollup",
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |  coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nk,
        |  count(*) AS cnt, round(sum(c_acctbal),4) AS total_bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
        |ORDER BY seg, nk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .withColumn("nk0", $"c_nationkey".cast("string"))
        .rollup($"c_mktsegment", $"nk0")
        .agg(count(lit(1)).as("cnt"), round(sum($"c_acctbal"), 4).as("total_bal"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("seg"),
          coalesce($"nk0", lit("ALL")).as("nk"), $"cnt", $"total_bal")
        .orderBy($"seg", $"nk")
    },

    entry(
      "agg_cube",
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |  coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nk,
        |  count(*) AS cnt FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
        |ORDER BY seg, nk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .withColumn("nk0", $"c_nationkey".cast("string"))
        .cube($"c_mktsegment", $"nk0")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("seg"),
          coalesce($"nk0", lit("ALL")).as("nk"), $"cnt")
        .orderBy($"seg", $"nk")
    },

    entry(
      "agg_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS cnt, round(sum(o_totalprice),4) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
        |ORDER BY status, prio""".stripMargin
    ) { (s, dir) =>
      load(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS prio,
          |  count(*) AS cnt, round(sum(o_totalprice),4) AS total
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
          |ORDER BY status, prio""".stripMargin)
    },

    // Pivot with an explicit value list (no extra distinct pass); missing
    // combos coalesced to 0 to match the oracle's conditional counts.
    entry(
      "agg_pivot",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(count(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type='error' THEN 1 END) AS BIGINT) AS error,
        |  CAST(count(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type='signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(count(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = loadEvents(s, dir)
        .withColumn("day", dayStr(date_trunc("day", $"ts")))
        .groupBy($"day").pivot("event_type", types).count()
      p.select($"day" +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy($"day")
    },

    // Exact percentiles for the oracle match; at 100 TB the same entry
    // swaps to percentile_approx (SURVEY.md §2.5).
    entry(
      "agg_percentile",
      """SELECT event_type, round(quantile_cont(value, 0.5),4) AS p50,
        |  round(quantile_cont(value, 0.9),4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))
        .orderBy($"event_type")
    },

    // Two-level mergeable-sketch distinct count: per-day HLL sketches
    // union into a monthly estimate — the pre-aggregation shape that
    // answers "distinct users this month" from daily partials WITHOUT
    // rescanning raw events. Q-gated (sketch bytes are engine-specific);
    // OperatorSpec pins the estimate within tolerance of exact.
    entryNoOracle("agg_hll_merge") { (s, dir) =>
      import s.implicits._
      val daily = loadEvents(s, dir)
        .select(date_format($"ts", "yyyy-MM").as("month"),
          dayStr($"ts").as("day"), $"user_id")
        .groupBy($"month", $"day")
        .agg(hll_sketch_agg($"user_id").as("sk"))
      daily.groupBy($"month")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"),
          count(lit(1)).as("n_days"))
        .orderBy($"month")
    },

    // The declared 100 TB percentile path: t-digest-style sketch
    // (percentile_approx), single-pass, mergeable partials — no per-group
    // sort/materialization. Q-gated (sketch internals are
    // engine-specific); OperatorSpec pins it within tolerance of exact.
    //
    // Determinism caveat: QuantileSummaries merges are order-dependent
    // once per-partition compression engages (~10k rows per group per
    // partition). The gate fixtures stay below that threshold, so
    // byte-stable audits hold there — but a byte-equality check across
    // DIFFERING parallelism at much larger SF could legitimately flake.
    // The CONTRACT for this entry is the OperatorSpec tolerance bound
    // (±5% of exact), not byte equality.
    entryNoOracle("agg_percentile_approx") { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(
          round(percentile_approx($"value", lit(0.5), lit(1000)), 4).as("p50"),
          round(percentile_approx($"value", lit(0.9), lit(1000)), 4).as("p90"))
        .orderBy($"event_type")
    },

    entry(
      "agg_median",
      """SELECT event_type, round(median(value), 4) AS med
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .groupBy($"event_type")
        .agg(round(median($"value"), 4).as("med"))
        .orderBy($"event_type")
    },

    entry(
      "agg_corr_covar",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS qp_covar
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Bivariate statistics per group — single-pass, mergeable partials
      // (same two-phase shape as every agg here).
      load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(round(corr($"l_quantity", $"l_extendedprice"), 4).as("qp_corr"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 4).as("qp_covar"))
        .orderBy($"l_returnflag")
    },

    entry(
      "agg_histogram",
      """WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem),
        |b AS (SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 16)), 15) AS BIGINT) AS bucket,
        |    lo, hi
        |  FROM lineitem, s)
        |SELECT bucket, round(lo + bucket * (hi - lo) / 16, 4) AS edge, count(*) AS n
        |FROM b GROUP BY bucket, lo, hi ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Equal-width histogram (16 buckets over the observed range) — the
      // numeric-distribution profile a data-quality pass renders. Two
      // passes by necessity (the range is data-dependent): a 1-row
      // min/max aggregate broadcast to a map-side bucket assignment +
      // two-phase count. Bucket math is pure IEEE double in the SAME
      // operation order as the oracle, so assignments are bit-identical;
      // the top edge folds into the last bucket (least(…, 15)).
      val li = load(s, dir, "lineitem").select($"l_extendedprice".as("x"))
      val stats = li.agg(min($"x").as("lo"), max($"x").as("hi"))
      li.crossJoin(broadcast(stats))
        .select(least(floor(($"x" - $"lo") / (($"hi" - $"lo") / 16)), lit(15))
            .cast("long").as("bucket"), $"lo", $"hi")
        .groupBy($"bucket", $"lo", $"hi")
        .agg(count(lit(1)).as("n"))
        .select($"bucket",
          round($"lo" + $"bucket" * ($"hi" - $"lo") / 16, 4).as("edge"), $"n")
        .orderBy($"bucket")
    },

    entry(
      "agg_regression",
      """SELECT event_type,
        |  round(regr_slope(value, epoch_us(ts) / 3600000000.0), 4) AS slope_per_hr,
        |  round(regr_intercept(value, epoch_us(ts) / 3600000000.0), 2) AS icept,
        |  round(regr_r2(value, epoch_us(ts) / 3600000000.0), 4) AS r2,
        |  CAST(regr_count(value, epoch_us(ts)) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Linear-regression aggregate family (regr_slope/intercept/r2) —
      // per-type value trend over time, the "is this metric drifting
      // and how fast" one-liner. x is epoch HOURS so the slope lands
      // well above the rounding unit (per-second slopes are ~10⁻⁶ —
      // exactly at 6dp resolution, a determinism trap). Single-pass
      // co-moment aggregates, merge-associative partials like
      // corr/covar; rounding absorbs partition-order ulps.
      loadEvents(s, dir)
        .withColumn("xh", unix_micros($"ts") / lit(3600000000.0))
        .groupBy($"event_type")
        .agg(
          round(regr_slope($"value", $"xh"), 4).as("slope_per_hr"),
          round(regr_intercept($"value", $"xh"), 2).as("icept"),
          round(regr_r2($"value", $"xh"), 4).as("r2"),
          regr_count($"value", $"xh").as("n"))
        .orderBy($"event_type")
    },

    entry(
      "agg_skew_kurtosis",
      """WITH m AS (SELECT event_type, avg(value) AS mu FROM events GROUP BY 1),
        |c AS (SELECT e.event_type,
        |    avg(pow(value - mu, 2)) AS m2, avg(pow(value - mu, 3)) AS m3,
        |    avg(pow(value - mu, 4)) AS m4, count(*) AS n
        |  FROM events e JOIN m ON m.event_type = e.event_type GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round(m3 / pow(m2, 1.5), 4) AS skewness,
        |  round(m4 / pow(m2, 2) - 3, 4) AS kurtosis_excess
        |FROM c ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Distribution-shape profile (skewness + excess kurtosis per
      // group) — the 3rd/4th-moment completion of the stats family
      // (corr/covar = 2nd moments, zscore = standardization): the
      // fat-tail / asymmetry panel a data owner reads before trusting
      // mean±σ thresholds. Spark's built-in skewness/kurtosis use
      // population moments while DuckDB's apply sample corrections, so
      // the portable form states the POPULATION formula explicitly via
      // central moments in both engines. Two passes like
      // agg_stats_zscore: per-group means broadcast back (group-sized
      // table), then ONE conditional-moment hash-agg; rounding at 4dp
      // absorbs partial-order ulps, same contract as corr/regr.
      // Measured values sit at |skew| ≈ 2, kurt ≈ 4-6 — far from the
      // rounding unit.
      val ev = loadEvents(s, dir)
      val m = ev.groupBy($"event_type").agg(avg($"value").as("mu"))
      ev.join(broadcast(m), "event_type")
        .groupBy($"event_type")
        .agg(
          avg(pow($"value" - $"mu", 2)).as("m2"),
          avg(pow($"value" - $"mu", 3)).as("m3"),
          avg(pow($"value" - $"mu", 4)).as("m4"),
          count(lit(1)).as("n"))
        .select($"event_type", $"n",
          round($"m3" / pow($"m2", 1.5), 4).as("skewness"),
          round($"m4" / pow($"m2", 2) - 3, 4).as("kurtosis_excess"))
        .orderBy($"event_type")
    },

    entry(
      "agg_listagg",
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Ordered string aggregation (LISTAGG / string_agg) — the
      // report-shaping staple. The portable deterministic form:
      // collect_set + array_sort + array_join (raw listagg is
      // order-arbitrary in both engines unless told otherwise). Scale
      // shape: collect_set partials merge associatively and the state
      // is bounded by event-type cardinality per user, not event
      // volume — this is safe ONLY for low-cardinality value domains
      // (for unbounded ones the right operator is topk/heavy-hitters,
      // not listagg).
      loadEvents(s, dir)
        .groupBy($"user_id")
        .agg(array_join(array_sort(collect_set($"event_type")), ",").as("types"),
          countDistinct($"event_type").as("n_types"))
        .orderBy($"user_id")
    },

    entry(
      "agg_mode",
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, cnt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cnt DESC, event_type) AS rn FROM c)
        |SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Per-group mode (most frequent event_type per user) with a total
      // deterministic tie-break (count desc, then type asc) — the
      // "dominant category" profile. Built-in `mode()` is tie-arbitrary
      // in both engines, so the portable form is stated explicitly:
      // hash-aggregate counts, then rank. Scale shape: the heavy work
      // is the two-phase (user, type) count; the window sorts the
      // ALREADY-AGGREGATED frame whose per-user partition is bounded by
      // type cardinality (a handful of rows), never the event stream.
      loadEvents(s, dir)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type")))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type".as("mode_type"), $"cnt")
        .orderBy($"user_id")
    },

    entry(
      "sql_correlated_agg",
      """SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                     WHERE c2.c_mktsegment = c.c_mktsegment)
        |ORDER BY c.c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Correlated-aggregate subquery in its decorrelated Spark form:
      // segment averages (tiny) broadcast-joined back to the fact — the
      // plan Catalyst's decorrelation would produce, stated explicitly.
      val cust = load(s, dir, "customer")
      val segAvg = cust.groupBy($"c_mktsegment").agg(avg($"c_acctbal").as("seg_avg"))
      cust.join(broadcast(segAvg), "c_mktsegment")
        .filter($"c_acctbal" > $"seg_avg")
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
        .orderBy($"c_custkey")
    }
  )

  // ---- §2.6 window functions --------------------------------------------

  val windows: Seq[Entry] = Seq(
    entry(
      "win_row_number_topn",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    entry(
      "win_rank_dense",
      """SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(rank() OVER (PARTITION BY l_partkey ORDER BY l_quantity) AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY l_partkey ORDER BY l_quantity) AS BIGINT) AS drnk
        |FROM lineitem
        |ORDER BY l_partkey, l_quantity, l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Window partitioned on the high-cardinality l_partkey (≈ SF×200k
      // keys): partitions stay small at any scale. The previous
      // l_returnflag key has ~3 values → 3 straggler tasks each sorting a
      // third of the table at 100×.
      val w = Window.partitionBy($"l_partkey").orderBy($"l_quantity")
      load(s, dir, "lineitem")
        .select($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy($"l_partkey", $"l_quantity", $"l_orderkey", $"l_linenumber")
    },

    // top_performers (reference agent.py:66): top 10% by balance.
    entry(
      "win_percent_topk",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal >= (SELECT quantile_cont(c_acctbal, 0.9) FROM customer)
        |ORDER BY c_acctbal DESC, c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Top-10%-by-sales (`top_performers`, reference agent.py:66) in the
      // scale-safe two-pass form: distributed exact percentile → 1-row
      // broadcast → map-side filter. The previous unpartitioned
      // percent_rank() window funneled the whole table through a single
      // partition ("No Partition Defined for Window" → OOM at 100×).
      // Spark `percentile` and DuckDB `quantile_cont` both linearly
      // interpolate at (n-1)*p in double — identical thresholds.
      val cust = load(s, dir, "customer")
      val thr = cust.agg(percentile($"c_acctbal", lit(0.9)).as("thr"))
      cust.crossJoin(broadcast(thr))
        .filter($"c_acctbal" >= $"thr")
        .select($"c_custkey", $"c_acctbal")
        .orderBy($"c_acctbal".desc, $"c_custkey")
    },

    entry(
      "win_lag_lead",
      """SELECT user_id, event_id,
        |  round(value - lag(value) OVER w, 4) AS delta,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      loadEvents(s, dir)
        .select($"user_id", $"event_id",
          round($"value" - lag($"value", 1).over(w), 4).as("delta"),
          lead($"event_type", 1).over(w).as("next_type"))
        .orderBy($"user_id", $"event_id")
    },

    entry(
      "win_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 4).as("run_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // RANGE frame over a numeric day index (Spark rangeBetween requires a
    // numeric ORDER BY key): trailing 30-day revenue per customer.
    entry(
      "win_range_frame",
      """SELECT o_custkey, o_orderkey, day,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS mv_total
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        |      FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-30, 0)
      load(s, dir, "orders")
        .withColumn("day", datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).cast("long"))
        .select($"o_custkey", $"o_orderkey", $"day",
          round(sum($"o_totalprice").over(w), 4).as("mv_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    entry(
      "win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          first($"o_totalprice").over(w).as("first_price"),
          last($"o_totalprice").over(w).as("last_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    entry(
      "win_ntile_cume",
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(cume_dist() OVER w, 4) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Quartile bucketing + cumulative distribution per market segment —
      // partitioned on c_mktsegment with a unique (acctbal, custkey)
      // order so both functions are deterministic.
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      load(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment",
          ntile(4).over(w).cast("long").as("quartile"),
          round(cume_dist().over(w), 4).as("cd"))
        .orderBy($"c_mktsegment", $"c_acctbal", $"c_custkey")
    },

    entry(
      "win_ntile_global",
      """WITH r AS (SELECT o_totalprice,
        |    (row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1) * 4
        |      // (count(*) OVER ()) + 1 AS quartile
        |  FROM orders)
        |SELECT quartile, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(min(o_totalprice), 4) AS lo, round(max(o_totalprice), 4) AS hi
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // GLOBAL rank-based quartiles WITHOUT a global sort — the
      // distributed total-ranking device (the oracle's
      // row_number() OVER (ORDER BY …) is the single-partition
      // pathology the fleet-wide plan guard bans): range-bucket by 15
      // APPROXIMATE split points (approximation only affects bucket
      // BALANCE, never correctness), per-bucket exact sort-rank in
      // parallel, then global rank = bucket prefix offset + in-bucket
      // rank — the same two-level prefix-sum shape as pack_sequences.
      // The only unpartitioned window runs over the 16-row bucket
      // totals. The quartile is the explicit rank formula
      // (rk−1)·4 DIV n + 1 — stated identically in the oracle instead
      // of ntile() so the semantics match at ANY n (ntile's
      // ceil/floor group split coincides only when n divides evenly).
      val o = load(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
      // split points and the global count come from ONE aggregate scan
      // (they were two separate scans + a second crossJoin), and n
      // rides the bucketed rows so the rank formula never re-meets the
      // fact: 4 scans of orders → 3 (bounds, bucket totals, rank pass)
      val bounds = o.agg(percentile_approx($"o_totalprice",
        typedLit((1 to 15).map(_ / 16.0)), lit(10000)).as("bs"),
        count(lit(1)).as("n"))
      val bucketed = o.crossJoin(broadcast(bounds))
        .select($"o_orderkey", $"o_totalprice", $"n",
          aggregate($"bs", lit(0),
            (acc, b) => acc + when($"o_totalprice" > b, 1).otherwise(0)).as("bkt"))
      val wOff = Window.orderBy($"bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = bucketed.groupBy($"bkt").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum($"bn").over(wOff), lit(0L)))
        .select($"bkt", $"off")
      val wIn = Window.partitionBy($"bkt").orderBy($"o_totalprice", $"o_orderkey")
      bucketed.join(broadcast(offs), "bkt")
        .withColumn("rk", row_number().over(wIn) + $"off")
        .select($"o_totalprice", expr("(rk - 1) * 4 DIV n + 1").as("quartile"))
        .groupBy($"quartile")
        .agg(count(lit(1)).as("n_orders"),
          round(min($"o_totalprice"), 4).as("lo"),
          round(max($"o_totalprice"), 4).as("hi"))
        .orderBy($"quartile")
    }
  )

  // ---- §2.7 sort / limit / top-k / set ops ------------------------------

  val sortSet: Seq[Entry] = Seq(
    entry(
      "sort_multi",
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
        .orderBy($"c_mktsegment".asc_nulls_first, $"c_acctbal".desc_nulls_last, $"c_custkey")
    },

    // ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    // heap, no global sort (SURVEY.md §4.2).
    entry(
      "topk_order_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    entry(
      "limit_offset",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40"
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
        .offset(40).limit(20)
    },

    entry(
      "set_union_all",
      """SELECT id, src FROM (
        |  SELECT c_custkey AS id, 'c' AS src FROM customer
        |  UNION ALL SELECT s_suppkey AS id, 's' AS src FROM supplier) t
        |ORDER BY src, id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val c = load(s, dir, "customer").select($"c_custkey".as("id"), lit("c").as("src"))
      val sup = load(s, dir, "supplier").select($"s_suppkey".as("id"), lit("s").as("src"))
      c.unionByName(sup).orderBy($"src", $"id")
    },

    entry(
      "set_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select($"c_nationkey".as("nk"))
        .union(load(s, dir, "supplier").select($"s_nationkey"))
        .distinct()
        .orderBy($"nk")
    },

    entry(
      "set_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select($"c_nationkey".as("nk"))
        .intersect(load(s, dir, "supplier").select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    },

    // EXCEPT against a date-filtered subset: every custkey appears in
    // unfiltered orders, so the unrestricted form passed vacuously on
    // 0 rows. "Customers with no order since Aug 2000" = 322 at sf0.01.
    entry(
      "set_except",
      """SELECT c_custkey AS id FROM customer
        |EXCEPT SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-08-01' ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select($"c_custkey".as("id"))
        .except(load(s, dir, "orders")
          .filter($"o_orderdate" >= lit("2000-08-01").cast("timestamp"))
          .select($"o_custkey".as("id")))
        .orderBy($"id")
    },

    entry(
      "set_except_all",
      """SELECT o_custkey AS id FROM orders
        |EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Bag-semantics EXCEPT ALL — multiplicity-aware difference (each
      // right occurrence cancels ONE left occurrence), the form
      // reconciliation/ledger diffs actually need where DISTINCT
      // except would collapse legitimate duplicates. Spark plans it as
      // a count-propagating aggregate + generate — one shuffle on the
      // value, no join explosion.
      val o = load(s, dir, "orders")
      o.select($"o_custkey".as("id"))
        .exceptAll(o.filter($"o_orderkey" % 3 === 0).select($"o_custkey".as("id")))
        .orderBy($"id")
    },

    entry(
      "set_intersect_all",
      """SELECT o_custkey AS id FROM orders WHERE o_orderkey % 2 = 0
        |INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Bag-semantics INTERSECT ALL — min-of-multiplicities overlap,
      // the dual of set_except_all. Same count-propagating aggregate
      // plan shape.
      val o = load(s, dir, "orders")
      o.filter($"o_orderkey" % 2 === 0).select($"o_custkey".as("id"))
        .intersectAll(o.filter($"o_orderkey" % 3 === 0).select($"o_custkey".as("id")))
        .orderBy($"id")
    },

    entry(
      "proj_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, round(value, 4) AS value
        |FROM (SELECT l_orderkey, l_linenumber,
        |        l_quantity AS quantity, l_extendedprice AS extendedprice,
        |        l_discount AS discount FROM lineitem)
        |UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Wide→long unpivot (melt) — the reshaping step between a
      // column-per-metric table and a (key, metric, value) frame that
      // generic profilers/plotters consume (profile_table uses the same
      // device internally via stack()). Codegen'd Expand: each input
      // row emits its k metric rows map-side — no shuffle beyond the
      // presentation sort.
      load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          expr("""stack(3, 'quantity', l_quantity,
                 |         'extendedprice', l_extendedprice,
                 |         'discount', l_discount) AS (metric, value)""".stripMargin))
        .select($"l_orderkey", $"l_linenumber", $"metric", round($"value", 4).as("value"))
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    }
  )

  /** Catalog temp-view SQL surface — the Spark-native replacement for the
    * reference's `CURRENT_TABLE` path substitution (engine.py:58-63):
    * `createOrReplaceTempView` + `spark.sql`, catalog-backed instead of
    * string-spliced.
    */
  val sqlEntry = entry(
    "sql_entry",
    """SELECT l_returnflag, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    load(s, dir, "lineitem").createOrReplaceTempView("current_table")
    s.sql(
      """SELECT l_returnflag, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        |  count(*) AS cnt
        |FROM current_table GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val entries: Seq[Entry] =
    Seq(q1) ++ projFilter ++ joins ++ aggs ++ windows ++ sortSet ++ Seq(sqlEntry)
}
