package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY §2's
  * inventory; `oracleSql` holds the equivalent ANSI SQL the driver runs
  * in DuckDB over the same parquet tables.
  *
  * Determinism conventions (so DuckDB/Spark hash-match):
  *  - monetary/quantity doubles are cast to exact decimals *before*
  *    arithmetic/aggregation, then the final value is cast back to
  *    double — decimal addition is associative, so shuffle order
  *    doesn't change the result;
  *  - averages are exact-decimal sums divided by counts in double;
  *  - every computed column is aliased identically on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum of a money/quantity double column, exactly (decimal-assoc). */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(12, 2))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregation (SURVEY §2.3 Aggregation; dozer-sql/src/aggregation) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---- Selection / WHERE (dozer-sql/src/selection/processor.rs) ----
    "q2_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 25 &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    // ---- Projection / expressions (dozer-sql/src/projection) ----
    "q3_project" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("net_price"),
        when(col("l_tax") > 0.05, "high").otherwise("low").as("tax_band"))
    }),

    // ---- Joins (dozer-sql/src/product/join; INNER/LEFT/RIGHT only) ----
    "q4_join_inner" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
    }),
    "q5_join_left" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("l_orderkey")).as("n_li"), count(lit(1)).as("n_rows"))
    }),
    "q6_join_right" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      l.join(o, o("o_orderkey") === l("l_orderkey"), "right")
        .groupBy(col("o_orderpriority"))
        .agg(count(col("l_linenumber")).as("n_li"), count(lit(1)).as("n_rows"))
    }),

    // ---- Set ops (dozer-sql/src/product/set; UNION / UNION ALL) ----
    "q7_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"), lit("cust").as("src"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"), lit("supp").as("src"))
      c.union(p).groupBy(col("nk"), col("src")).agg(count(lit(1)).as("n"))
    }),
    "q8_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(p).distinct()
    }),
    "q9_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // ---- HAVING (aggregation/factory.rs:20-148) ----
    "q10_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") > 5)
    }),

    // ---- AVG / MIN / MAX (aggregation/{avg,min,max}.rs) ----
    "q11_avg_minmax" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast("double") /
            count(col("l_extendedprice"))).as("avg_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
    }),

    // ---- MIN_VALUE / MAX_VALUE → min_by/max_by (aggregation/{min,max}_value.rs) ----
    "q12_minby_maxby" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"))
    }),

    // ---- TUMBLE window (dozer-sql/src/window/operator.rs:106-130) ----
    "q13_tumble" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // ---- HOP window (dozer-sql/src/window/operator.rs:59-104) ----
    "q14_hop" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"), col("event_type"), col("n"))
    }),

    // ---- ORDER BY + LIMIT (batch-only; dozer rejects, SURVEY §2.3) ----
    "q15_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 25 AND l_returnflag = 'R'""".stripMargin,
    "q3_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
        |  CASE WHEN l_tax > 0.05 THEN 'high' ELSE 'low' END AS tax_band
        |FROM lineitem""".stripMargin,
    "q4_join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q5_join_left" ->
      """SELECT o_orderstatus, COUNT(l_orderkey) AS n_li, COUNT(*) AS n_rows
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q6_join_right" ->
      """SELECT o_orderpriority, COUNT(l_linenumber) AS n_li, COUNT(*) AS n_rows
        |FROM lineitem RIGHT JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_union_all" ->
      """SELECT nk, src, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk, 'cust' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk, 'supp' AS src FROM supplier
        |) GROUP BY nk, src""".stripMargin,
    "q8_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin,
    "q9_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q10_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5""".stripMargin,
    "q11_avg_minmax" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q12_minby_maxby" ->
      """SELECT o_orderpriority,
        |  MAX_BY(o_totalprice, o_orderkey) AS latest_price,
        |  MIN_BY(o_totalprice, o_orderkey) AS first_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q13_tumble" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q14_hop" ->
      """SELECT ws AS window_start, ws + INTERVAL '10 minutes' AS window_end,
        |  event_type, COUNT(*) AS n
        |FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws, event_type FROM events
        |) GROUP BY 1, 2, 3""".stripMargin,
    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin
  )
}
