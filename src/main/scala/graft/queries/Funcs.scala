package graft.queries

import org.apache.spark.sql.functions._
import graft.Core._

/** Scalar function families (SURVEY.md §2.8): string / regex / date / math
  * / conditional / cast / array / map / JSON. All built-in
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs.
  *
  * Type alignment with the DuckDB oracle: derived integers are cast to
  * BIGINT on both sides (Spark `year`/`length`/`ceil` return int/long where
  * DuckDB differs), and timestamps/dates are stringified (Core.tsStr).
  */
object Funcs {

  val entries: Seq[Entry] = Seq(
    entry(
      "fn_string",
      """SELECT c_custkey,
        |  upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        |  substring(c_name, 10, 9) AS id_part,
        |  concat(c_name, '-', c_mktsegment) AS tagged,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  replace(c_name, 'Customer#', 'CUST-') AS renamed,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  trim(concat(' ', c_name, ' ')) AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select(
        $"c_custkey",
        upper($"c_name").as("uname"), lower($"c_mktsegment").as("lseg"),
        substring($"c_name", 10, 9).as("id_part"),
        concat($"c_name", lit("-"), $"c_mktsegment").as("tagged"),
        length($"c_name").cast("long").as("name_len"),
        regexp_replace($"c_name", lit("Customer#"), lit("CUST-")).as("renamed"),
        lpad($"c_custkey".cast("string"), 12, "0").as("padded"),
        trim(concat(lit(" "), $"c_name", lit(" "))).as("trimmed")
      ).orderBy($"c_custkey")
    },

    entry(
      "fn_regex",
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS id_num,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select(
        $"c_custkey",
        regexp_extract($"c_name", "([0-9]+)$", 1).cast("long").as("id_num"),
        regexp_replace($"c_name", "[0-9]", "#").as("masked")
      ).orderBy($"c_custkey")
    },

    entry(
      "fn_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders").select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dy"),
        dayStr(date_trunc("month", $"o_orderdate")).as("month_start"),
        dayStr(date_add(to_date($"o_orderdate"), 30)).as("plus30"),
        datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"),
        dayStr(last_day(to_date($"o_orderdate"))).as("month_end")
      ).orderBy($"o_orderkey")
    },

    entry(
      "fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  round(ln(l_extendedprice), 4) AS ln_price,
        |  round(pow(1 + l_discount, 2), 4) AS pow_disc,
        |  round(abs(l_discount - 0.05), 4) AS abs_ctr,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
        |  CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
        |  l_partkey % 7 AS pk_mod,
        |  CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        round(sqrt($"l_extendedprice"), 4).as("sqrt_price"),
        round(log($"l_extendedprice"), 4).as("ln_price"),
        round(pow(lit(1) + $"l_discount", 2), 4).as("pow_disc"),
        round(abs($"l_discount" - 0.05), 4).as("abs_ctr"),
        ceil($"l_quantity").cast("long").as("ceil_qty"),
        floor($"l_quantity").cast("long").as("floor_qty"),
        ($"l_partkey" % 7).as("pk_mod"),
        signum($"l_discount" - 0.05).cast("long").as("disc_sign")
      ).orderBy($"l_orderkey", $"l_linenumber")
    },

    entry(
      "fn_cond_case",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
        |  round(greatest(o_totalprice, 150000.0), 4) AS floor_at,
        |  round(least(o_totalprice, 150000.0), 4) AS cap_at
        |FROM orders ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "orders").select(
        $"o_orderkey",
        when($"o_totalprice" > 300000, "high")
          .when($"o_totalprice" > 100000, "mid").otherwise("low").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_label"),
        round(greatest($"o_totalprice", lit(150000.0)), 4).as("floor_at"),
        round(least($"o_totalprice", lit(150000.0)), 4).as("cap_at")
      ).orderBy($"o_orderkey")
    },

    entry(
      "fn_cast",
      """SELECT c_custkey,
        |  CAST(substring(c_name, 10, 9) AS BIGINT) AS id_from_str,
        |  CAST(c_custkey AS DOUBLE) / 2 AS half_key,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(round(c_acctbal) AS BIGINT) AS bal_int
        |FROM customer ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "customer").select(
        $"c_custkey",
        substring($"c_name", 10, 9).cast("long").as("id_from_str"),
        ($"c_custkey".cast("double") / 2).as("half_key"),
        $"c_custkey".cast("string").as("key_str"),
        round($"c_acctbal", 0).cast("long").as("bal_int")
      ).orderBy($"c_custkey")
    },

    entry(
      "fn_array",
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tok,
        |  list_contains(toks, 'the') AS has_the,
        |  array_to_string(list_sort(toks), ' ') AS sorted_text,
        |  array_to_string(list_transform(toks[1:3], x -> upper(x)), ' ') AS head3_upper,
        |  array_to_string(list_filter(toks, x -> length(x) > 4), ' ') AS long_toks,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars
        |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents WHERE doc_id < 50) t
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      load(s, dir, "documents").filter($"doc_id" < 50)
        .withColumn("toks", tokens($"text"))
        .select(
          $"doc_id",
          size($"toks").cast("long").as("n_tok"),
          array_contains($"toks", "the").as("has_the"),
          array_join(array_sort($"toks"), " ").as("sorted_text"),
          array_join(transform(slice($"toks", 1, 3), x => upper(x)), " ").as("head3_upper"),
          array_join(filter($"toks", x => length(x) > 4), " ").as("long_toks"),
          aggregate($"toks", lit(0L), (acc, x) => acc + length(x)).as("tok_chars")
        ).orderBy($"doc_id")
    },

    entry(
      "fn_map",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir)
        .withColumn("m", from_json($"props",
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
        .select(
          $"event_id",
          element_at($"m", "k").as("k_val"),
          size(map_keys($"m")).cast("long").as("n_keys")
        ).orderBy($"event_id")
    },

    entry(
      "fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      loadEvents(s, dir).select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("long").as("k_num")
      ).orderBy($"event_id")
    },

    entry(
      "fn_bitwise",
      """SELECT event_id,
        |  event_id & 255 AS band,
        |  event_id | 15 AS bor,
        |  xor(event_id, 129) AS bxor,
        |  event_id << 2 AS shl,
        |  event_id >> 3 AS shr,
        |  CAST(bit_count(event_id) AS BIGINT) AS popcnt
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      // Bitwise scalar surface — mask/shift/popcount, the key-munging
      // primitives the salting/z-order/LSH layers are built from,
      // exposed as first-class functions. Pure codegen'd projection;
      // integer-exact on both engines.
      loadEvents(s, dir).select(
        $"event_id",
        $"event_id".bitwiseAND(255).as("band"),
        $"event_id".bitwiseOR(15).as("bor"),
        $"event_id".bitwiseXOR(129).as("bxor"),
        shiftleft($"event_id", 2).as("shl"),
        shiftright($"event_id", 3).as("shr"),
        bit_count($"event_id").cast("long").as("popcnt")
      ).orderBy($"event_id")
    }
  )
}
