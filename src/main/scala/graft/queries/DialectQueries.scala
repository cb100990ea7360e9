package graft.queries

import Q._
import graft.sql.GraftSqlRunner

/** End-to-end dozer-dialect scripts through [[GraftSqlRunner]] —
  * exercising the INTO chaining and window table functions inside the
  * driver's oracle gate (not just unit tests).
  */
object DialectQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q44_sql_into_chain",
      """SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        |HAVING COUNT(*) > 100""".stripMargin) { (s, dir) =>
      val r = new GraftSqlRunner(s)
      r.registerSource("events", t(s, dir, "events"))
      r.run(
        """SELECT event_type, COUNT(*) AS n INTO by_type FROM events GROUP BY event_type;
          |SELECT event_type, n INTO busy FROM by_type WHERE n > 100""".stripMargin)("busy")
    },

    QueryDef("q45_sql_tumble",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val r = new GraftSqlRunner(s)
      r.registerSource("events", t(s, dir, "events"))
      r.run(
        """SELECT window_start, event_type, COUNT(*) AS n INTO w
          |FROM TUMBLE(events, ts, '1 hour') GROUP BY window_start, event_type""".stripMargin)("w")
    },

    // SESSION table function (beyond ref's TUMBLE/HOP): gap-based
    // sessionization in the dialect, same gaps-and-islands oracle as
    // the DataFrame session query (q15b)
    QueryDef("q46b_sql_session",
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
      val r = new GraftSqlRunner(s)
      r.registerSource("events", t(s, dir, "events"))
      r.run(
        """SELECT user_id, window_start, COUNT(*) AS n_events INTO sess
          |FROM SESSION(events, ts, '30 minutes') GROUP BY window_start, user_id""".stripMargin)("sess")
        .withColumnRenamed("window_start", "session_start")
    },

    QueryDef("q46_sql_hop",
      """SELECT ws AS window_start, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws FROM events
        |) GROUP BY 1""".stripMargin) { (s, dir) =>
      val r = new GraftSqlRunner(s)
      r.registerSource("events", t(s, dir, "events"))
      r.run(
        """SELECT window_start, COUNT(*) AS n INTO h
          |FROM HOP(events, ts, '5 minutes', '10 minutes') GROUP BY window_start""".stripMargin)("h")
    }
  )
}
