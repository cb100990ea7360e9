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
