package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Core relational operator surface (SURVEY §2.3):
  * aggregation, selection, projection, joins, set ops, HAVING,
  * extremum aggregates, TUMBLE/HOP windows, batch ORDER BY/LIMIT.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(
    // Aggregation — dozer-sql/src/aggregation/processor.rs:48-586
    QueryDef("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // Selection / WHERE — dozer-sql/src/selection/processor.rs:12-106
    QueryDef("q2_filter",
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 25 AND l_returnflag = 'R'""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 25 &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    },

    // Projection — dozer-sql/src/projection/processor.rs:12-101
    QueryDef("q3_project",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
        |  CASE WHEN l_tax > 0.05 THEN 'high' ELSE 'low' END AS tax_band
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("net_price"),
        when(col("l_tax") > 0.05, "high").otherwise("low").as("tax_band"))
    },

    // INNER equi-join — dozer-sql/src/product/join/operator/mod.rs:16-20
    QueryDef("q4_join_inner",
      """SELECT c_mktsegment, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
    },

    // LEFT OUTER join null-padding — join/operator/mod.rs:75-135
    QueryDef("q5_join_left",
      """SELECT o_orderstatus, COUNT(l_orderkey) AS n_li, COUNT(*) AS n_rows
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("l_orderkey")).as("n_li"), count(lit(1)).as("n_rows"))
    },

    // RIGHT OUTER join — join/operator/mod.rs:16-20
    QueryDef("q6_join_right",
      """SELECT o_orderpriority, COUNT(l_linenumber) AS n_li, COUNT(*) AS n_rows
        |FROM lineitem RIGHT JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      l.join(o, o("o_orderkey") === l("l_orderkey"), "right")
        .groupBy(col("o_orderpriority"))
        .agg(count(col("l_linenumber")).as("n_li"), count(lit(1)).as("n_rows"))
    },

    // UNION ALL — dozer-sql/src/product/set/operator.rs:33-80
    QueryDef("q7_union_all",
      """SELECT nk, src, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk, 'cust' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk, 'supp' AS src FROM supplier
        |) GROUP BY nk, src""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"), lit("cust").as("src"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"), lit("supp").as("src"))
      c.union(p).groupBy(col("nk"), col("src")).agg(count(lit(1)).as("n"))
    },

    // UNION distinct via CountingRecordMap — set/record_map/mod.rs:18-100
    QueryDef("q8_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(p).distinct()
    },

    QueryDef("q9_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    },

    // HAVING — dozer-sql/src/aggregation/processor.rs:93-120
    QueryDef("q10_having",
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") > 5)
    },

    // AVG/MIN/MAX — dozer-sql/src/aggregation/{avg,min,max}.rs
    QueryDef("q11_avg_minmax",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (sum(dec2(col("l_extendedprice"))).cast("double") /
            count(col("l_extendedprice"))).as("avg_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
    },

    // MIN_VALUE/MAX_VALUE (argmin/argmax) — aggregation/{min,max}_value.rs
    QueryDef("q12_minby_maxby",
      """SELECT o_orderpriority,
        |  MAX_BY(o_totalprice, o_orderkey) AS latest_price,
        |  MIN_BY(o_totalprice, o_orderkey) AS first_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"))
    },

    // TUMBLE — dozer-sql/src/window/operator.rs:106-130
    QueryDef("q13_tumble",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("sum_value"))
    },

    // HOP — dozer-sql/src/window/operator.rs:59-104
    QueryDef("q14_hop",
      """SELECT ws AS window_start, ws + INTERVAL '10 minutes' AS window_end,
        |  event_type, COUNT(*) AS n
        |FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws, event_type FROM events
        |) GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"), col("event_type"), col("n"))
    },

    // Star join: facts shuffled, dimensions explicitly broadcast — the
    // plan shape that must hold at 100 TB (SCALE.md §Joins)
    QueryDef("q15a_star_join",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      // Partial-aggregation pushdown through the join (OSS Catalyst
      // doesn't do this): every lineitem row matches exactly one order
      // (l_orderkey is orders' PK), so summing per orderkey BEFORE the
      // join is semantics-preserving and shrinks the fact side from
      // |lineitem| to |orders| rows — the shuffle that dominates this
      // query at 100 TB. Decimal partials keep the final double cast
      // bit-identical to the single-pass sum.
      val lagg = l.groupBy(l("l_orderkey"))
        .agg(
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast(org.apache.spark.sql.types.DecimalType(4, 2)) -
              col("l_discount").cast(org.apache.spark.sql.types.DecimalType(4, 2))))
            .as("rev_part"),
          count(lit(1)).as("cnt_part"))
      lagg.join(o, lagg("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("rev_part")).cast("double").as("revenue"),
          sum(col("cnt_part")).as("n_items"))
    },

    // TPC-H Q3 shape (beyond the reference's own joins — the shipping-
    // priority query): SELECTIVE filters on both join sides (market
    // segment, order date, ship date) + grouped revenue + deterministic
    // top-10. Exercises filter pushdown into every scan and a
    // TakeOrdered instead of a global sort; dates leave the query as
    // epoch-day BIGINTs (hash-stable), revenue via exact decimal
    // partials cast once to double.
    QueryDef("q15f_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  CAST(floor(epoch_us(o_orderdate) / 86400000000) AS BIGINT) AS o_day
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND epoch_us(o_orderdate) < 795225600000000
        |  AND epoch_us(l_shipdate) > 795225600000000
        |GROUP BY l_orderkey, o_day
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val cutoff = 795225600000000L // 1995-03-15 UTC in micros
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(unix_micros(col("o_orderdate").cast("timestamp")) < cutoff)
      val l = t(s, dir, "lineitem")
        .filter(unix_micros(col("l_shipdate").cast("timestamp")) > cutoff)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          floor(unix_micros(col("o_orderdate").cast("timestamp")) /
            86400000000L).cast("long").as("o_day"))
        .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(4, 2)) -
            col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_day"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q10 shape: returned-item revenue by customer, top 20 — a
    // fact-side filter (returnflag) joined through orders to a grouped
    // customer dimension with the nation name broadcast in. Grouped
    // top-k again lowers to TakeOrdered.
    QueryDef("q15g_tpch_q10",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = broadcast(t(s, dir, "nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(4, 2)) -
            col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // SESSION window (beyond reference's TUMBLE/HOP; Spark session_window
    // == SQL gaps-and-islands with a 30-minute gap). Boundary semantics:
    // both split strictly when gap exceeded; exact-boundary ties are
    // measure-zero on µs data.
    QueryDef("q15b_session_window",
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"), col("n_events"))
    },

    // AS-OF join (custom operator Spark lacks; DuckDB's native ASOF JOIN
    // is the oracle). Right side pre-deduped per (key, ts) so tie
    // resolution is deterministic on both engines.
    QueryDef("q15c_asof_join",
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT e.event_id, e.user_id,
        |  od.o_orderdate AS last_order_date, od.o_orderkey AS last_order_key
        |FROM events e
        |ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate""".stripMargin) { (s, dir) =>
      val od = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsOfJoin.asofJoin(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts", od, "o_custkey", "o_orderdate")
        .filter(col("o_orderkey").isNotNull) // inner ASOF semantics
        .select(col("event_id"), col("user_id"),
          col("o_orderdate").as("last_order_date"),
          col("o_orderkey").as("last_order_key"))
    },

    // LEFT SEMI / ANTI joins — EXISTS / NOT EXISTS without subquery
    // expressions (which dozer's builder rejects; SURVEY §2.4)
    QueryDef("q15d_semi_anti",
      """SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS bucket, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("bucket"), col("n"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("without_orders").as("bucket"), col("n"))
      semi.union(anti)
    },

    // Binned range join (no equi key: point-in-interval). OSS Spark
    // nested-loops this shape; graft bins it — see operators.RangeJoin
    QueryDef("q15e_range_join",
      """SELECT s.s_suppkey, count(*) AS n_cust
        |FROM supplier s JOIN customer c
        |  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500
        |GROUP BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"),
          (col("s_acctbal") + 500).as("s_hi"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      graft.operators.RangeJoin.pointInInterval(
        cust, "c_acctbal", sup, "s_acctbal", "s_hi", binWidth = 500.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_cust"))
    },

    // ORDER BY + LIMIT (batch; dozer rejects in streaming — builder/mod.rs:133-143)
    QueryDef("q15_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // Correlated SCALAR subquery (TPC-H Q17 shape, per-brand output).
    // The Spark side runs the correlated text verbatim — Catalyst's
    // decorrelation rewrites it into the aggregate-join plan, which is
    // the plan you'd hand-write at 100 TB (one shuffle on l_partkey for
    // the per-part average, then a fact-fact join on the same key, so
    // the exchange is reused). Determinism: the threshold is an exact
    // decimal sum cast to double, divided by a count, then * 0.5 — the
    // identical IEEE expression tree on both engines.
    QueryDef("q60_corr_scalar_subq",
      """SELECT p.p_brand,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
        |  COUNT(*) AS n_small
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < (
        |  SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("g60_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g60_part")
      s.sql(
        """SELECT p.p_brand,
          |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
          |  COUNT(*) AS n_small
          |FROM g60_lineitem l JOIN g60_part p ON p.p_partkey = l.l_partkey
          |WHERE l.l_quantity < (
          |  SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
          |  FROM g60_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY p.p_brand""".stripMargin)
    },

    // Correlated subquery in HAVING (TPC-H Q20 shape): suppliers with a
    // part whose shipped share exceeds 30% of that part's corpus-wide
    // total. The DataFrame side is the hand-decorrelated plan: both
    // aggregates shuffle on l_partkey (exchange reuse), then a
    // broadcast-able semi join onto supplier.
    QueryDef("q61_corr_having_subq",
      """SELECT s.s_suppkey, s.s_name FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 0.3 * (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      // Two independent aggregations over the same scan, joined on
      // l_partkey. A/B-measured against deriving perPart from
      // perSuppPart's decimal sums (single scan, associative re-agg):
      // the derived form serializes the stages behind one exchange and
      // was slower AND high-variance locally (7-27s vs a stable ~2s).
      // On a real cluster with a 100 TB fact table, flip to the derived
      // form — there the second SCAN dominates, not stage latency.
      val perSuppPart = li.groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("supp_qty"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("part_qty"))
      val dominant = perSuppPart.join(perPart, Seq("l_partkey"))
        .filter(col("supp_qty") > lit(0.3) * col("part_qty"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }
  )
}
