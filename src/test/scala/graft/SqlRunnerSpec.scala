package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sql.{GraftSqlException, GraftSqlRunner, SqlText}

class SqlRunnerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  private def runner(streaming: Boolean = false) = {
    val r = new GraftSqlRunner(spark, streaming)
    r.registerSource("events", Tables.load(spark, dir, "events"))
    r.registerSource("orders", Tables.load(spark, dir, "orders"))
    r
  }

  test("INTO chains statements through temp views") {
    val out = runner().run(
      """SELECT event_type, COUNT(*) AS n INTO by_type FROM events GROUP BY event_type;
        |SELECT event_type, n INTO busy FROM by_type WHERE n > 100""".stripMargin)
    assert(out.keySet == Set("by_type", "busy"))
    assert(out("busy").count() > 0)
    assert(out("busy").count() < out("by_type").count() ||
      out("by_type").count() == out("busy").count())
  }

  test("SELECT without INTO is rejected (dozer builder/mod.rs:336-344)") {
    val e = intercept[GraftSqlException](runner().run("SELECT 1 AS x FROM events"))
    assert(e.getMessage.contains("INTO"))
  }

  test("TUMBLE rewrites to epoch-aligned windows matching window()") {
    val out = runner().run(
      """SELECT window_start, event_type, COUNT(*) AS n INTO w
        |FROM TUMBLE(events, ts, '1 hour') GROUP BY window_start, event_type""".stripMargin)("w")
    val expected = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("HOP emits one row per overlapping window") {
    val out = runner().run(
      """SELECT window_start, COUNT(*) AS n INTO h
        |FROM HOP(events, ts, '5 minutes', '10 minutes') GROUP BY window_start""".stripMargin)("h")
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 2 * Tables.load(spark, dir, "events").count())
  }

  test("TTL passes through on batch relations") {
    val out = runner().run(
      """SELECT user_id, COUNT(*) AS n INTO t
        |FROM TTL(events, ts, '1 hour') GROUP BY user_id""".stripMargin)("t")
    assert(out.count() == Tables.load(spark, dir, "events")
      .select("user_id").distinct().count())
  }

  test("SESSION sessionizes with gap semantics matching session_window()") {
    val out = runner().run(
      """SELECT user_id, window_start, COUNT(*) AS n INTO s
        |FROM SESSION(events, ts, '30 minutes') GROUP BY window_start, user_id""".stripMargin)("s")
    val expected = Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("window_start"), col("n"))
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("streaming SESSION produces a streaming session-window aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val r = new graft.sql.GraftSqlRunner(spark, streaming = true)
    r.registerSource("sev", mem.toDF().withWatermark("ts", "1 hour"))
    val out = r.run(
      """SELECT user, window_start, COUNT(*) AS n INTO sess_out
        |FROM SESSION(sev, ts, '30 minutes') GROUP BY window_start, user""".stripMargin)("sess_out")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("sess_out_t")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        Ev(ts("2024-01-01 00:00:00"), "a", 1.0),
        Ev(ts("2024-01-01 00:10:00"), "a", 1.0),  // same session (gap < 30m)
        Ev(ts("2024-01-01 02:00:00"), "a", 1.0))  // new session
      q.processAllAvailable()
      val rows = spark.table("sess_out_t")
        .select($"user", $"n").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSet == Set(("a", 2L), ("a", 1L)) || rows.sorted.toSeq == Seq(("a", 1L), ("a", 2L)))
    } finally q.stop()
  }

  test("streaming TTL substitutes a watermarked view") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val r = new graft.sql.GraftSqlRunner(spark, streaming = true)
    r.registerSource("sev", mem.toDF())
    val out = r.run(
      """SELECT user, COUNT(*) AS n INTO ttl_out
        |FROM TTL(sev, ts, '30 minutes') GROUP BY user""".stripMargin)("ttl_out")
    assert(out.isStreaming)
    assert(out.queryExecution.analyzed.toString.toLowerCase.contains("watermark"))
  }

  test("streaming TTL accepts an arbitrary timestamp expression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val r = new graft.sql.GraftSqlRunner(spark, streaming = true)
    r.registerSource("sev2", mem.toDF())
    // lifetime keyed off an arithmetic expression of the event time
    // (factory.rs:142-205) — projected into a synthetic watermark col
    val out = r.run(
      """SELECT user, COUNT(*) AS n INTO ttl_expr_out
        |FROM TTL(sev2, ts + INTERVAL '5' MINUTE, '30 minutes')
        |GROUP BY user""".stripMargin)("ttl_expr_out")
    assert(out.isStreaming)
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.toLowerCase.contains("watermark"))
    assert(analyzed.contains("__ttl_ts"))
    // and it runs end-to-end
    val q = out.writeStream.format("memory").queryName("ttl_expr_t")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(Ev(ts("2024-01-01 00:00:00"), "a", 1.0),
        Ev(ts("2024-01-01 00:01:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ttl_expr_t").select($"n").collect()
      assert(rows.map(_.getLong(0)).sum == 2L)
    } finally q.stop()
  }

  test("event-analytics table operators run from dialect SQL and match " +
      "the operator API; streaming configs reject them") {
    val ev = Tables.load(spark, dir, "events")
    val out = runner().run(
      """SELECT user_id, funnel_level INTO converted
        |FROM WINDOW_FUNNEL(events, user_id, ts, event_id, event_type,
        |  'view,click,purchase', '6 hours') WHERE funnel_level >= 2;
        |SELECT user_id, funnel_level INTO strict
        |FROM WINDOW_FUNNEL(events, user_id, ts, event_id, event_type,
        |  'view,click,purchase', '6 hours', 'strict_increase');
        |SELECT user_id, n_matched INTO pairs
        |FROM SEQUENCE_COUNT(events, user_id, ts, event_id, event_type,
        |  'view', 'purchase') WHERE n_matched > 0;
        |SELECT cohort_day, n_users, n_d1 INTO cohorts
        |FROM RETENTION(events, user_id, ts, '1,7');
        |SELECT user_id, min_ttc_us INTO latency
        |FROM TIME_TO_CONVERSION(events, user_id, ts, event_id, event_type,
        |  'view', 'purchase', '6 hours')""".stripMargin)
    import graft.operators.EventFunnel
    val W = 21600000000L
    val steps = Seq("view", "click", "purchase")
    val wantConverted = EventFunnel.windowFunnel(ev, "user_id", "ts",
      "event_id", "event_type", steps, W)
      .filter(col("funnel_level") >= 2)
    assert(out("converted").count() == wantConverted.count() &&
      out("converted").except(wantConverted).count() == 0)
    val wantStrict = EventFunnel.windowFunnel(ev, "user_id", "ts",
      "event_id", "event_type", steps, W,
      EventFunnel.FunnelMode.StrictIncrease)
    assert(out("strict").except(wantStrict).count() == 0)
    val wantPairs = EventFunnel.sequencePairCount(ev, "user_id", "ts",
      "event_id", "event_type", "view", "purchase")
      .filter(col("n_matched") > 0).select("user_id", "n_matched")
    assert(out("pairs").except(wantPairs).count() == 0 &&
      out("pairs").count() == wantPairs.count())
    assert(out("cohorts").count() ==
      EventFunnel.retention(ev, "user_id", "ts", Seq(1, 7)).count())
    val wantTtc = EventFunnel.timeToConversion(ev, "user_id", "ts",
      "event_id", "event_type", "view", "purchase", W)
    assert(out("latency").except(wantTtc).count() == 0 &&
      out("latency").count() == wantTtc.count())
    // unknown mode is loud
    val bad = intercept[Exception](runner().run(
      """SELECT user_id INTO x FROM WINDOW_FUNNEL(events, user_id, ts,
        |  event_id, event_type, 'view', '1 hour', 'nope')""".stripMargin))
    assert(bad.getMessage.contains("unknown mode") ||
      Option(bad.getCause).exists(_.getMessage.contains("unknown mode")))
    // round 11: streaming WINDOW_FUNNEL maps to the stateful twin
    // instead of rejecting — same SQL, same columns (GraftAppSpec
    // drives it end-to-end through an upsert sink); operators WITHOUT
    // a full-shape twin still reject loudly
    val streamed = runner(streaming = true).run(
      """SELECT user_id, funnel_level INTO f
        |FROM WINDOW_FUNNEL(events, user_id, ts, event_id, event_type,
        |  'view', '1 hour')""".stripMargin)
    assert(streamed("f").columns.toSet == Set("user_id", "funnel_level"))
    val e = intercept[Exception](runner(streaming = true).run(
      """SELECT cohort_day INTO c
        |FROM RETENTION(events, user_id, ts, '1,7')""".stripMargin))
    assert(e.getMessage.contains("batch table operator") ||
      Option(e.getCause).exists(_.getMessage.contains("batch table operator")),
      e.toString)
  }

  test("streaming mode rejects ORDER BY / LIMIT like the reference") {
    val r = runner(streaming = true)
    assert(intercept[GraftSqlException](
      r.run("SELECT user_id INTO x FROM events ORDER BY user_id"))
      .getMessage.contains("ORDER BY"))
    assert(intercept[GraftSqlException](
      r.run("SELECT user_id INTO x FROM events LIMIT 5"))
      .getMessage.contains("LIMIT"))
  }

  test("recursive CTEs and INTERSECT/EXCEPT are rejected") {
    assert(intercept[GraftSqlException](runner().run(
      "WITH RECURSIVE r AS (SELECT 1) SELECT * INTO x FROM r"))
      .getMessage.contains("recursive"))
    assert(intercept[GraftSqlException](runner().run(
      "SELECT user_id INTO x FROM events INTERSECT SELECT user_id FROM events"))
      .getMessage.contains("INTERSECT"))
  }

  test("statement splitting respects quoted semicolons") {
    val stmts = SqlText.splitStatements(
      "SELECT 'a;b' AS s INTO x FROM t; SELECT 1 INTO y FROM u")
    assert(stmts.length == 2)
    assert(stmts.head.contains("'a;b'"))
  }

  test("ORDER BY inside a string literal is not rejected in streaming") {
    val r = runner(streaming = true)
    val out = r.run("SELECT 'ORDER BY' AS s, COUNT(*) AS n INTO ok FROM events GROUP BY 1")
    assert(out("ok").count() == 1)
  }
}
