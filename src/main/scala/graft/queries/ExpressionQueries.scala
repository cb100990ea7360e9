package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._
import graft.functions.GraftFunctions

/** Scalar expression surface (SURVEY §2.4) + SQL constructs the
  * reference's builder supports (CTEs, derived tables) and the batch
  * extensions Spark gives for free (OVER windows, ROLLUP,
  * INTERSECT/EXCEPT — dozer rejects these, SURVEY §2.3).
  */
object ExpressionQueries {

  val all: Seq[QueryDef] = Seq(

    // String functions — dozer-sql/expression/src/scalar/string.rs
    QueryDef("q16_strings",
      """SELECT c_custkey,
        |  UPPER(c_name) AS uname,
        |  LENGTH(c_name) AS name_len,
        |  SUBSTR(c_name, 1, 8) AS name_head,
        |  REPLACE(c_name, 'Customer#', 'C') AS short_name,
        |  CONCAT(c_mktsegment, ':', c_name) AS tagged,
        |  TRIM(CONCAT(' ', c_mktsegment, ' ')) AS trimmed
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        GraftFunctions.ucase(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_head"),
        // literal (non-regex) replace — cheaper than regexp_replace and
        // exactly the oracle's REPLACE semantics
        replace(col("c_name"), lit("Customer#"), lit("C")).as("short_name"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
        trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("trimmed"))
    },

    // EXTRACT / TO_CHAR — expression/src/datetime.rs:107-142, scalar/string.rs:244
    QueryDef("q17_datetime",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dy,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |  CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
        |  CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS wk,
        |  CAST(EXTRACT(epoch FROM o_orderdate) AS BIGINT) AS epoch_s,
        |  STRFTIME(o_orderdate, '%Y-%m-%d %H:%M') AS formatted
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("wk"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        GraftFunctions.toChar(col("o_orderdate"), lit("%Y-%m-%d %H:%M")).as("formatted"))
    },

    // CASE / IN / LIKE / IS NULL — expression/src/{case.rs,in_list.rs,is_null.rs}
    QueryDef("q18_case_in_like",
      """SELECT p_partkey,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS size_band,
        |  (p_brand IN ('Brand#13','Brand#19','Brand#5')) AS fav_brand,
        |  (p_name LIKE '%widget%') AS is_widget,
        |  (p_type IS NULL) AS type_missing
        |FROM part
        |WHERE p_name LIKE 'l%' OR p_brand IN ('Brand#2')""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("l%") || col("p_brand").isin("Brand#2"))
        .select(
          col("p_partkey"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "mid").otherwise("big").as("size_band"),
          col("p_brand").isin("Brand#13", "Brand#19", "Brand#5").as("fav_brand"),
          col("p_name").like("%widget%").as("is_widget"),
          col("p_type").isNull.as("type_missing"))
    },

    // NVL / DECODE / COALESCE / NULLIF / LEAST — scalar/field.rs, conditional.rs
    QueryDef("q19_nullhandling",
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_masked,
        |  LEAST(c_acctbal, 1000.0) AS capped_bal,
        |  CASE c_nationkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' ELSE 'other' END AS nk_decoded,
        |  COALESCE(NULL, NULL, c_name) AS nvl_name
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        GraftFunctions.nvl(nullif(col("c_mktsegment"), lit("BUILDING")), lit("suppressed")).as("seg_masked"),
        least(col("c_acctbal"), lit(1000.0)).as("capped_bal"),
        GraftFunctions.decodeExpr(col("c_nationkey"),
          lit(0), lit("zero"), lit(1), lit("one"), lit("other")).as("nk_decoded"),
        coalesce(lit(null), lit(null), col("c_name")).as("nvl_name"))
    },

    // ABS / ROUND — scalar/number.rs
    QueryDef("q20_numeric",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_quantity - 25) AS qty_dev,
        |  ROUND(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS price_r1,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(l_orderkey AS VARCHAR) AS key_str
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          round(dec2(col("l_extendedprice")), 1).as("price_r1"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          col("l_orderkey").cast("string").as("key_str"))
    },

    // CTE — dozer-sql/src/builder/mod.rs:146-180
    QueryDef("q21_cte",
      """WITH big_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |  GROUP BY o_custkey HAVING COUNT(*) > 5
        |)
        |SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(n_orders) AS BIGINT) AS total_orders
        |FROM customer JOIN big_cust ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val bigCust = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 5)
      t(s, dir, "customer")
        .join(bigCust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("n_orders")).cast("long").as("total_orders"))
    },

    // Derived table (subquery in FROM) — builder/mod.rs:524-548
    QueryDef("q22_derived",
      """SELECT seg, n_cust FROM (
        |  SELECT c_mktsegment AS seg, COUNT(*) AS n_cust FROM customer GROUP BY c_mktsegment
        |) WHERE n_cust > 10""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_cust"))
        .filter(col("n_cust") > 10)
        .select(col("seg"), col("n_cust"))
    },

    // POINT / DISTANCE — geo/{point.rs,distance.rs}. No SQL oracle: libm
    // ulp drift between JVM and DuckDB breaks hash equality; parity is
    // covered by GeoSpec against reference-style fixed vectors instead.
    QueryDef.noOracle("q23_geo") { (s, dir) =>
      val n = t(s, dir, "nation").select(
        col("n_nationkey"),
        GraftFunctions.point(
          (col("n_nationkey") * 14.0) - 175.0,
          (col("n_nationkey") * 6.0) - 72.0).as("pt"))
      val origin = GraftFunctions.point(lit(0.0), lit(0.0))
      n.select(
        col("n_nationkey"),
        GraftFunctions.distance(col("pt"), origin, "HAVERSINE").as("hav_m"),
        GraftFunctions.distance(col("pt"), origin, "VINCENTY").as("vin_m"))
    },

    // Geo DISTANCE with an ORACLE — the q39b rank trick applied to the
    // geo family: ranking the 25 nation points by haversine distance to
    // the origin is float-stable (min adjacent gap ~806 m, nine-plus
    // orders above libm ulp drift), so (nation, rank) hash-matches a
    // DuckDB haversine formulated in plain SQL even though the raw
    // meters (q23) cannot. Exercises the codegen'd GeoUdfs path under
    // the hard gate.
    QueryDef("q23b_geo_rank",
      """SELECT n_nationkey, CAST(rn AS INTEGER) AS dist_rank FROM (
        |  SELECT n_nationkey, ROW_NUMBER() OVER (ORDER BY
        |    2*6371000*asin(sqrt(
        |      pow(sin(radians(n_nationkey*6.0 - 72.0)/2), 2) +
        |      cos(radians(0))*cos(radians(n_nationkey*6.0 - 72.0)) *
        |      pow(sin(radians(n_nationkey*14.0 - 175.0)/2), 2))) ASC,
        |    n_nationkey ASC) AS rn
        |  FROM nation)""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          GraftFunctions.distance(
            GraftFunctions.point(
              (col("n_nationkey") * 14.0) - 175.0,
              (col("n_nationkey") * 6.0) - 72.0),
            GraftFunctions.point(lit(0.0), lit(0.0)),
            "HAVERSINE").as("hav"))
        .select(col("n_nationkey"),
          row_number().over(
            Window.orderBy(col("hav").asc, col("n_nationkey").asc))
            .as("dist_rank"))
    },

    // JSON_VALUE / JSON_QUERY — json_functions.rs:44-118 (props = {"k": int})
    QueryDef("q24_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$') AS VARCHAR) AS full_json,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(GraftFunctions.jsonValue(col("props"), lit("$.k")).cast("long").as("k"),
          GraftFunctions.jsonQuery(col("props"), lit("$")).as("full_json"))
        .groupBy(col("k"), col("full_json")).agg(count(lit(1)).as("n"))
    },

    // OVER-clause analytics (beyond reference; SURVEY §2.3 row for
    // rank/row_number/lag — batch only)
    QueryDef("q25_window_over",
      """SELECT o_orderkey, o_custkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk,
        |  LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
    },

    // ROLLUP (beyond reference — SURVEY §2.3 grouping sets row)
    QueryDef("q26_rollup",
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // CHR / interval arithmetic / DOW / LIKE-escape — remaining scalar
    // surface (scalar/string.rs:279 chr; datetime.rs INTERVAL; Dow field)
    QueryDef("q29a_misc_scalars",
      """SELECT n_nationkey,
        |  CHR(65 + n_nationkey % 26) AS letter,
        |  o_orderdate + INTERVAL '3 days' AS due_date,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |  (n_name LIKE 'NATION!_1%' ESCAPE '!') AS is_teen_nation
        |FROM nation JOIN orders ON o_custkey % 25 = n_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "orders"), col("o_custkey") % 25 === col("n_nationkey"))
        .select(
          col("n_nationkey"),
          expr("chr(65 + n_nationkey % 26)").as("letter"), // graft-registered CHR
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("due_date"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          expr("n_name LIKE 'NATION!_1%' ESCAPE '!'").as("is_teen_nation"))
    },

    // COUNT(DISTINCT) (beyond reference; Catalyst expand-based distinct agg)
    QueryDef("q29b_count_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
    },

    // Probabilistic distinct counting — the Spark analogue of dozer's
    // opt-in probabilistic state compression (counting bloom filter for
    // UNION distinct, record_map/bloom.rs; hashed record keys,
    // models/flags.rs:27-52). HLL++ sketches bound state the same way.
    // rows-only: HLL estimates are engine-specific.
    QueryDef.noOracle("q29c_approx_distinct") { (s, dir) =>
      // Dedupe (flag, partkey) pairs first, then compute both aggregates
      // in ONE pass: exact distinct = count(*) over the deduped pairs,
      // and the HLL sketch is duplicate-insensitive so its estimate is
      // unchanged. Avoids Catalyst's expand plan (which doubles the
      // aggregate input rows to host exact + approx side by side).
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"))
        .distinct()
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count(lit(1)).as("exact_parts"))
    },

    // Statistical aggregates (beyond ref): stddev assembled from exact
    // decimal components so both engines compute identical doubles;
    // median of integral-valued quantities interpolates identically.
    QueryDef("q26b_stats",
      """SELECT l_returnflag,
        |  SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |        - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |          * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |       / (COUNT(*) - 1)) AS std_qty,
        |  QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val q = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sqrt((sum(q * q).cast("double") -
            sum(q).cast("double") * sum(q).cast("double") / count(lit(1))) /
            (count(lit(1)) - 1)).as("std_qty"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          count(lit(1)).as("n"))
    },

    // CUBE (beyond ref, pairs with q26_rollup)
    QueryDef("q26c_cube",
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // INTERSECT / EXCEPT (dozer's builder rejects — builder/mod.rs:213-227;
    // provided here as batch extensions)
    QueryDef("q27_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
    },
    QueryDef("q28_except",
      """SELECT p_brand FROM part WHERE p_size > 40
        |EXCEPT
        |SELECT p_brand FROM part WHERE p_size <= 10""".stripMargin) { (s, dir) =>
      val p = t(s, dir, "part")
      p.filter(col("p_size") > 40).select(col("p_brand"))
        .except(p.filter(col("p_size") <= 10).select(col("p_brand")))
    },

    // Python UDF runtime (python_udf.rs:29-81): the dialect's
    // `name<type>(args)` calls resolve against module `python_udf` and
    // execute on per-task-thread python3 workers (graft.functions.PyUdf —
    // PySpark's worker model without PySpark). Fully oracled: the fixture
    // functions are integer-exact, so DuckDB replays the arithmetic and
    // the hash gate covers the whole pipe — syntax rewrite, struct
    // marshaling, JSON wire round-trip, and typed extraction.
    QueryDef("q92_python_udf",
      """SELECT doc_id AS id,
        |  (doc_id * 31 + n_chars) % 9973 AS score,
        |  ((n_chars % 2) = 0) AS even_len
        |FROM documents""".stripMargin) { (s, dir) =>
      val mod = graft.functions.PyUdf.ensureFixtureModule(
        """def py_doc_score(doc_id, n_chars):
          |    return (doc_id * 31 + n_chars) % 9973
          |def py_even(n):
          |    return n % 2 == 0
          |""".stripMargin, "graft_pyudf_oracle")
      s.conf.set("spark.graft.python_udf.dir", mod)
      val runner = new graft.sql.GraftSqlRunner(s)
      runner.registerSource("documents", par(s, t(s, dir, "documents")))
      runner.run(
        """SELECT doc_id AS id,
          |  py_doc_score<int>(doc_id, n_chars) AS score,
          |  py_even<boolean>(n_chars) AS even_len
          |FROM documents INTO q92""".stripMargin)("q92")
    },

    // JavaScript UDF runtime (udf_config.rs UdfType::JavaScript;
    // evaluate.rs 1-arg Json→Json contract) on the ES-subset interpreter
    // (graft.functions.JsMini — JDK 17 has no JS engine, so the module
    // runs on a thread-confined tree-walking evaluator; per-row eval is
    // in-JVM and shuffle-free). Fully oracled: the module's integer
    // word/vowel arithmetic replays exactly in DuckDB, covering parse,
    // default-export resolution, struct→object marshaling, the
    // String/Array prototype surface, and JSON serialization.
    QueryDef("q93_js_udf",
      """SELECT doc_id AS id,
        |  len(list_filter(string_split(text, ' '), x -> len(x) > 0)) * 1000
        |    + (length(text) - length(regexp_replace(text, '[aeiouAEIOU]', '', 'g'))) % 97
        |    + doc_id % 7 AS score
        |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, dir) =>
      graft.functions.JsUdf.register(s, "js_doc_score",
        """export default function (doc) {
          |  let words = doc.text.split(" ").filter(w => w.length > 0);
          |  let vowels = 0;
          |  for (let w of words) {
          |    for (let i = 0; i < w.length; i++) {
          |      if ("aeiouAEIOU".includes(w.charAt(i))) vowels++;
          |    }
          |  }
          |  return words.length * 1000 + vowels % 97 + doc.doc_id % 7;
          |}""".stripMargin)
      par(s, t(s, dir, "documents"))
        .filter(col("text").isNotNull)
        .selectExpr("doc_id AS id",
          "CAST(js_doc_score(struct(text, doc_id)) AS BIGINT) AS score")
    },

    // JS REGEX UDFs (the most common real-world JS idiom the subset
    // previously lacked): regex literals, g/i flags, String.replace
    // with a regex, String.match-count, RegExp.test — all on the JDK
    // engine (JsMini.VRegExp). Fully oracled against DuckDB's RE2
    // regexp functions over the same documents: a mis-lexed literal
    // (division ambiguity), wrong global semantics, or flag mishandling
    // hash-fails on masked/words/has_the.
    QueryDef("q93b_js_regex_udf",
      """SELECT doc_id AS id,
        |  regexp_replace(text, '[0-9]+', '#', 'g') AS masked,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
        |    AS words,
        |  regexp_matches(text, 'data', 'i') AS has_data
        |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, dir) =>
      graft.functions.JsUdf.register(s, "js_mask",
        "export default function (t) { return t.replace(/[0-9]+/g, \"#\"); }")
      graft.functions.JsUdf.register(s, "js_word_count",
        "export default function (t) { const m = t.match(/[A-Za-z]+/g); " +
          "return m === null ? 0 : m.length; }")
      graft.functions.JsUdf.register(s, "js_has_data",
        "export default function (t) { return /data/i.test(t); }")
      t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .selectExpr("doc_id AS id",
          // the UDF surface returns JSON — '$' unwraps the top-level
          // string with its escapes resolved
          "get_json_object(js_mask(text), '$') AS masked",
          "CAST(js_word_count(text) AS BIGINT) AS words",
          "CAST(js_has_data(text) AS BOOLEAN) AS has_data")
    }
  )
}
