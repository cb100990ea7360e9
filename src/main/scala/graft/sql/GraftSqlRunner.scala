package graft.sql

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dozer-dialect SQL front-end (SURVEY §3 entry point 2).
  *
  * Mirrors `statement_to_pipeline` (reference:
  * dozer-sql/src/builder/mod.rs:79-361) as a thin preprocessor over
  * Spark SQL — the dialect delta is small because Catalyst natively
  * handles everything else (CTEs, derived tables, UNION, expressions):
  *
  *  - multi-statement scripts split on top-level `;`
  *  - every top-level SELECT must name its sink table via
  *    `INTO <name>` (builder/mod.rs:336-344); outputs are registered
  *    as temp views so later statements can read them — the
  *    `QueryContext.output_tables_map` chaining (builder/mod.rs:41-58)
  *  - FROM-clause table functions rewritten to Spark equivalents:
  *      TUMBLE(src, ts, 'interval')        → window(ts, interval)
  *      HOP(src, ts, 'slide', 'interval')  → window(ts, interval, slide)
  *      TTL(src, ts, 'interval')           → watermark spec on src
  *    plus the graft event-analytics table operators (batch):
  *      WINDOW_FUNNEL / SEQUENCE_COUNT / RETENTION / TIME_TO_CONVERSION
  *        (state-eviction hint: a no-op on batch relations, becomes
  *         `withWatermark` when the registered source is streaming —
  *         reference table_operator/lifetime.rs:29-88)
  *  - rejections matching the reference builder: ORDER BY / LIMIT /
  *    OFFSET in streaming mode (builder/mod.rs:133-143), recursive
  *    CTEs (:147-151), INTERSECT/EXCEPT (:213-227)
  */
final class GraftSqlException(msg: String) extends RuntimeException(msg)

class GraftSqlRunner(spark: SparkSession, streaming: Boolean = false) {

  private val outputs = mutable.LinkedHashMap.empty[String, DataFrame]

  /** Register an input table (the `sources:` section of a dozer config). */
  def registerSource(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Execute a script; returns sink-name → DataFrame in statement order. */
  def run(script: String): Map[String, DataFrame] = {
    SqlText.splitStatements(script).foreach(runStatement)
    outputs.toMap
  }

  private def runStatement(stmt: String): Unit = {
    validate(stmt)
    val (sql, into) = SqlText.extractInto(stmt)
    val rewritten = SqlText.rewriteTableFunctions(
      SqlText.rewritePythonUdfs(sql, spark), streaming, spark)
    val df = spark.sql(rewritten)
    into match {
      case Some(name) =>
        df.createOrReplaceTempView(name)
        outputs += name -> df
      case None =>
        throw new GraftSqlException(
          "SELECT statements must name a sink table with INTO <name>")
    }
  }

  // Keyword checks are regex-over-stripped-text: string literals can't
  // false-positive, but a QUOTED IDENTIFIER literally named `limit` /
  // `except` etc. would (they are reserved words in the dozer dialect,
  // so the corpus can't produce one). A parser-level check would need
  // Catalyst's parsed tree before analysis — not worth it for the
  // dialect subset; revisit if a corpus file ever trips this.
  private def validate(stmt: String): Unit = {
    val bare = SqlText.stripStrings(stmt)
    val up = bare.toUpperCase
    if (streaming) {
      if (up.matches("(?s).*\\bORDER\\s+BY\\b.*"))
        throw new GraftSqlException("ORDER BY is not supported in streaming queries")
      if (up.matches("(?s).*\\bLIMIT\\b.*") || up.matches("(?s).*\\bOFFSET\\b.*"))
        throw new GraftSqlException("LIMIT and OFFSET are not supported in streaming queries")
    }
    if (up.matches("(?s).*\\bWITH\\s+RECURSIVE\\b.*"))
      throw new GraftSqlException("recursive CTEs are not supported")
    if (up.matches("(?s).*\\bINTERSECT\\b.*") || up.matches("(?s).*\\bEXCEPT\\b.*"))
      throw new GraftSqlException("INTERSECT and EXCEPT are not supported in the dozer dialect")
  }
}

/** Quote-aware text utilities for the dialect preprocessor. */
object SqlText {

  /** Split on `;` outside single/double-quoted strings; drop blanks. */
  def splitStatements(script: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    script.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == ';') { out += cur.toString; cur.clear() }
      else cur += c
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Blank out string literals (keeps offsets) for keyword scanning. */
  def stripStrings(sql: String): String = {
    val sb = new StringBuilder(sql)
    var quote: Char = 0
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 else sb.setCharAt(i, ' ') }
      else if (c == '\'' || c == '"') quote = c
      i += 1
    }
    sb.toString
  }

  /** Pull `INTO <name>` out of a SELECT (dozer's sink naming). */
  def extractInto(sql: String): (String, Option[String]) = {
    val re = "(?i)\\bINTO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*".r
    re.findFirstMatchIn(stripStrings(sql)) match {
      case Some(m) =>
        val cleaned = sql.substring(0, m.start) + sql.substring(m.end)
        (cleaned, Some(m.group(1)))
      case None => (sql, None)
    }
  }

  /** Rewrite TUMBLE/HOP/TTL FROM-clause table functions.
    *
    * `TUMBLE(src, ts, '1 hour')` becomes a derived table that appends
    * `window_start`/`window_end` (dozer appends them to the schema and
    * PK — window/operator.rs:36-56). HOP uses Spark's sliding window,
    * which explodes each row into its overlapping windows exactly like
    * the reference (operator.rs:59-104).
    */
  def rewriteTableFunctions(sql: String, streaming: Boolean,
      spark: SparkSession): String = {
    var result = sql
    var pendingWindow: Option[String] = None // native window() expr (streaming)
    var evtViews = 0 // unique names for event-analytics result views
    def unq(s: String): String = s.trim.stripPrefix("'").stripSuffix("'")
    var changed = true
    while (changed) {
      changed = false
      findCall(result, Set("TUMBLE", "HOP", "SESSION", "TTL",
        "WINDOW_FUNNEL", "SEQUENCE_COUNT", "RETENTION",
        "TIME_TO_CONVERSION", "CHAR_WINDOW_DUP", "CHAR_WINDOW_DUP_TOP",
        "LOG_HIST", "LOG_HIST_QUANTILES", "PAGE_RANK",
        "TRIANGLE_COUNTS", "ATTRIBUTION",
        "ICEBERG_SNAPSHOTS", "ICEBERG_FILES", "DELTA_HISTORY")) match {
        case Some((fn, start, end, args)) =>
          // event-analytics table operators (graft extensions beyond the
          // reference dialect): each materializes its aggregate as a
          // derived view the rest of the query reads. Batch-mode only —
          // live pipelines use graft.streaming.FunnelStream's stateful
          // twins, whose update-emission semantics don't fit a
          // FROM-clause table.
          def evtView(out: org.apache.spark.sql.DataFrame): String = {
            require(!streaming,
              s"$fn is a batch table operator in this form; streaming " +
                "pipelines use the stateful stream twins (WINDOW_FUNNEL " +
                "and LOG_HIST_QUANTILES map to them automatically; the " +
                "rest live in graft.streaming.FunnelStream/HistStream)")
            evtViews += 1
            val vn = s"__evt$evtViews"
            out.createOrReplaceTempView(vn)
            vn
          }
          // streaming table operators with FULL-SHAPE stateful twins
          // register the twin's result (still a streaming DataFrame) —
          // the same SQL runs in both modes, the dozer dialect promise
          def streamView(out: org.apache.spark.sql.DataFrame): String = {
            evtViews += 1
            val vn = s"__evt$evtViews"
            out.createOrReplaceTempView(vn)
            vn
          }
          def funnelMode(a: Seq[String]) = a.drop(7).headOption.map(m =>
            unq(m).toLowerCase match {
              case "strict_increase" =>
                graft.operators.EventFunnel.FunnelMode.StrictIncrease
              case "strict_order" =>
                graft.operators.EventFunnel.FunnelMode.StrictOrder
              case "strict_dedup" | "strict_deduplication" =>
                graft.operators.EventFunnel.FunnelMode.StrictDedup
              case other => throw new IllegalArgumentException(
                s"WINDOW_FUNNEL: unknown mode '$other'")
            }).getOrElse(graft.operators.EventFunnel.FunnelMode.Default)
          val replacement = fn match {
            case "WINDOW_FUNNEL" if streaming =>
              // same argument surface as batch; the stateful twin keeps
              // O(K) per-user state and re-emits levels as they deepen
              // (update-mode output — pair with an upsert sink)
              val a = args.map(_.trim)
              val steps = unq(a(5)).split(",").map(_.trim).toSeq
              val win = graft.functions.HopWindows
                .parseDurationMicros(unq(a(6)))
              streamView(graft.streaming.FunnelStream.windowFunnelStream(
                spark.table(a(0)), a(1), a(2), a(3), a(4), steps, win,
                mode = funnelMode(a))
                .toDF().withColumnRenamed("user", a(1)))
            case "WINDOW_FUNNEL" =>
              // WINDOW_FUNNEL(src, user, ts, ord, type, 'steps,csv',
              //   'window' [, 'strict_increase|strict_order|strict_dedup'])
              val a = args.map(_.trim)
              val steps = unq(a(5)).split(",").map(_.trim).toSeq
              val win = graft.functions.HopWindows
                .parseDurationMicros(unq(a(6)))
              evtView(graft.operators.EventFunnel.windowFunnel(
                spark.table(a(0)), a(1), a(2), a(3), a(4), steps, win,
                funnelMode(a)))
            case "SEQUENCE_COUNT" if streaming =>
              // stateful twin (three-long state per user), full column
              // parity with the batch operator
              val a = args.map(_.trim)
              streamView(graft.streaming.FunnelStream
                .sequencePairCountStream(
                  spark.table(a(0)), a(1), a(2), a(3), a(4),
                  unq(a(5)), unq(a(6)))
                .toDF().withColumnRenamed("user", a(1)))
            case "SEQUENCE_COUNT" =>
              // SEQUENCE_COUNT(src, user, ts, ord, type, 'first', 'second')
              val a = args.map(_.trim)
              evtView(graft.operators.EventFunnel.sequencePairCount(
                spark.table(a(0)), a(1), a(2), a(3), a(4),
                unq(a(5)), unq(a(6))))
            case "RETENTION" =>
              // RETENTION(src, user, ts, 'offsets,csv')
              val a = args.map(_.trim)
              evtView(graft.operators.EventFunnel.retention(
                spark.table(a(0)), a(1), a(2),
                unq(a(3)).split(",").map(_.trim.toInt).toSeq))
            case "TIME_TO_CONVERSION" if streaming =>
              // stateful twin: two longs of state per user, min gap
              // re-emitted on improvement (full column parity)
              val a = args.map(_.trim)
              streamView(graft.streaming.FunnelStream
                .timeToConversionStream(
                  spark.table(a(0)), a(1), a(2), a(3), a(4),
                  unq(a(5)), unq(a(6)),
                  graft.functions.HopWindows.parseDurationMicros(unq(a(7))))
                .toDF().withColumnRenamed("user", a(1)))
            case "TIME_TO_CONVERSION" =>
              // TIME_TO_CONVERSION(src, user, ts, ord, type,
              //   'first', 'second', 'window')
              val a = args.map(_.trim)
              evtView(graft.operators.EventFunnel.timeToConversion(
                spark.table(a(0)), a(1), a(2), a(3), a(4),
                unq(a(5)), unq(a(6)),
                graft.functions.HopWindows.parseDurationMicros(unq(a(7)))))
            case "CHAR_WINDOW_DUP" =>
              // CHAR_WINDOW_DUP(src, id, text [, k, stride]) — per-doc
              // character-window duplication profile (Dedup family)
              val a = args.map(_.trim)
              evtView(graft.operators.Dedup.charWindowDupStats(
                spark.table(a(0)), a(1), a(2),
                k = a.lift(3).map(_.toInt).getOrElse(40),
                stride = a.lift(4).map(_.toInt).getOrElse(10)))
            case "CHAR_WINDOW_DUP_TOP" =>
              // CHAR_WINDOW_DUP_TOP(src, id, text [, k, stride, topN])
              val a = args.map(_.trim)
              evtView(graft.operators.Dedup.charWindowDupTop(
                spark.table(a(0)), a(1), a(2),
                k = a.lift(3).map(_.toInt).getOrElse(40),
                stride = a.lift(4).map(_.toInt).getOrElse(10),
                topN = a.lift(5).map(_.toInt).getOrElse(20)))
            case "LOG_HIST" =>
              // LOG_HIST(src, group, value [, bits]) — mergeable
              // log-linear histogram (Sketches family)
              val a = args.map(_.trim)
              evtView(graft.operators.Sketches.logHistogram(
                spark.table(a(0)), Seq(a(1)), a(2),
                bits = a.lift(3).map(_.toInt).getOrElse(5)))
            case "LOG_HIST_QUANTILES" if streaming =>
              // stateful twin: bounded bucket-map state per group,
              // quantile rows re-emitted as histograms grow
              val a = args.map(_.trim)
              streamView(graft.streaming.HistStream.quantileEstimates(
                spark.table(a(0)), a(1), a(2),
                bits = a.lift(3).map(_.toInt).getOrElse(5),
                qPcts = a.lift(4).map(p =>
                    unq(p).split(",").map(_.trim.toInt).toSeq)
                  .getOrElse(Seq(50, 90, 99)))
                .toDF().withColumnRenamed("group", a(1)))
            case "LOG_HIST_QUANTILES" =>
              // LOG_HIST_QUANTILES(src, group, value [, bits, 'p,csv'])
              val a = args.map(_.trim)
              evtView(graft.operators.Sketches.logHistQuantiles(
                spark.table(a(0)), Seq(a(1)), a(2),
                bits = a.lift(3).map(_.toInt).getOrElse(5),
                qPcts = a.lift(4).map(p =>
                    unq(p).split(",").map(_.trim.toInt).toSeq)
                  .getOrElse(Seq(50, 90, 99))))
            case "PAGE_RANK" =>
              // PAGE_RANK(edges, src, dst [, iters, dampingPct])
              val a = args.map(_.trim)
              evtView(graft.operators.GraphRank.pageRank(
                spark.table(a(0)), a(1), a(2),
                iters = a.lift(3).map(_.toInt).getOrElse(3),
                dampingPct = a.lift(4).map(_.toInt).getOrElse(85)))
            case "TRIANGLE_COUNTS" =>
              // TRIANGLE_COUNTS(edges, src, dst)
              val a = args.map(_.trim)
              evtView(graft.operators.GraphRank.triangleCounts(
                spark.table(a(0)), a(1), a(2)))
            case "ICEBERG_SNAPSHOTS" =>
              // ICEBERG_SNAPSHOTS('<table path>') — the commit-history
              // inspection table (id, seq, operation, summary)
              val a = args.map(_.trim)
              evtView(graft.sources.IcebergLite.snapshotsDf(
                spark, unq(a(0))))
            case "DELTA_HISTORY" =>
              // DELTA_HISTORY('<table path>') — DESCRIBE HISTORY
              val a = args.map(_.trim)
              evtView(graft.sources.DeltaLite.historyDf(spark, unq(a(0))))
            case "ICEBERG_FILES" =>
              // ICEBERG_FILES('<table path>' [, snapshotId]) — live
              // files with counts, sizes and decoded column bounds
              val a = args.map(_.trim)
              evtView(graft.sources.IcebergLite.filesDf(spark,
                unq(a(0)), a.lift(1).map(_.toLong)))
            case "ATTRIBUTION" =>
              // ATTRIBUTION(src, user, ts, ord, type, channelCol,
              //   'touch', 'conv', 'window') — project the channel
              //   column upstream (same prep-view pattern as LOG_HIST)
              val a = args.map(_.trim)
              evtView(graft.operators.EventFunnel.attribution(
                spark.table(a(0)), a(1), a(2), a(3), a(4),
                org.apache.spark.sql.functions.col(a(5)),
                unq(a(6)), unq(a(7)),
                graft.functions.HopWindows.parseDurationMicros(unq(a(8)))))
            case "SESSION" =>
              // gap-based session windows (beyond the reference's
              // TUMBLE/HOP): Spark's session_window works in GROUP BY
              // for both batch and streaming, so both modes route
              // through the same window-ref rewrite
              val Seq(src, ts, gap) = args.map(_.trim)
              pendingWindow = Some(s"session_window($ts, $gap)")
              src
            case "TUMBLE" =>
              val Seq(src, ts, size) = args.map(_.trim)
              if (streaming) {
                // native window() keeps the event-time/watermark linkage
                // Spark needs for bounded state + append output
                pendingWindow = Some(s"window($ts, $size)")
                src
              } else
                s"""(SELECT __t.*, w.start AS window_start, w.end AS window_end
                   | FROM $src AS __t
                   | LATERAL VIEW EXPLODE(hop_windows($ts, $size, $size)) __x AS w) __tumble""".stripMargin
            case "HOP" =>
              val Seq(src, ts, slide, size) = args.map(_.trim)
              if (streaming) {
                pendingWindow = Some(s"window($ts, $size, $slide)")
                src
              } else
                s"""(SELECT __t.*, w.start AS window_start, w.end AS window_end
                   | FROM $src AS __t
                   | LATERAL VIEW EXPLODE(hop_windows($ts, $slide, $size)) __x AS w) __hop""".stripMargin
            case "TTL" =>
              val Seq(src, ts, dur) = args.map(_.trim)
              // Batch: TTL only governs state eviction, not row
              // visibility — pass through. Streaming: substitute a
              // watermarked view of the source (state-TTL semantics,
              // reference table_operator/lifetime.rs:29-88). `ts` may
              // be any timestamp EXPRESSION (factory.rs:142-205), not
              // just a column — non-column expressions are projected
              // into a synthetic event-time column first.
              val base = spark.table(src)
              val isPlainColumn =
                ts.matches("[A-Za-z_][A-Za-z0-9_]*") &&
                  base.columns.exists(_.equalsIgnoreCase(ts))
              if (streaming) {
                val viewName = s"${src}__ttl"
                val unquoted = dur.stripPrefix("'").stripSuffix("'")
                val watermarked =
                  if (isPlainColumn)
                    graft.streaming.StreamOps.ttl(base, ts, unquoted)
                  else
                    graft.streaming.StreamOps.ttlExpr(
                      base, org.apache.spark.sql.functions.expr(ts), unquoted)
                watermarked.createOrReplaceTempView(viewName)
                viewName
              } else if (isPlainColumn) src
              else
                // batch parity: expression TTL projects the same
                // synthetic column streaming's watermark lives on, so
                // SELECT * yields one schema in both modes
                s"""(SELECT __t.*, $ts AS __ttl_ts FROM $src AS __t) __ttlb"""
          }
          result = result.substring(0, start) + replacement + result.substring(end)
          changed = true
        case None =>
      }
    }
    pendingWindow.fold(result)(w => rewriteWindowRefs(result, w))
  }

  /** Streaming window rewrite: GROUP BY keeps the whole `window()`
    * struct (watermark metadata lives on it); SELECT/HAVING references
    * to window_start/window_end become field extractions of the same
    * grouping expression (semantically-equal match in Catalyst).
    */
  def rewriteWindowRefs(sql: String, winExpr: String): String = {
    val gbRe = "(?is)(GROUP\\s+BY\\s+)(.*?)(\\s+HAVING\\b|\\s+ORDER\\b|\\s+LIMIT\\b|$)".r
    val grouped = gbRe.replaceAllIn(sql, m => {
      val keys = m.group(2).split(",").map(_.trim).map {
        case k if k.equalsIgnoreCase("window_start") ||
          k.equalsIgnoreCase("window_end") => winExpr
        case k => k
      }.distinct
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + keys.mkString(", ") + m.group(3))
    })
    // SELECT-list references get aliased extractions; references anywhere
    // else (HAVING, join conditions) get bare extractions (no AS allowed).
    val selRe = "(?is)(SELECT\\s+)(.*?)(\\s+FROM\\b)".r
    val selected = selRe.replaceAllIn(grouped, m =>
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + m.group(2)
          .replaceAll("(?i)\\bwindow_start\\b", s"$winExpr.start AS __ws_alias__")
          .replaceAll("(?i)\\bwindow_end\\b", s"$winExpr.end AS __we_alias__") +
          m.group(3)))
    selected
      .replaceAll("(?i)\\bwindow_start\\b", s"$winExpr.start")
      .replaceAll("(?i)\\bwindow_end\\b", s"$winExpr.end")
      .replace("__ws_alias__", "window_start")
      .replace("__we_alias__", "window_end")
  }

  /** Rewrite the reference's Python-UDF call syntax
    * `name<RETURN_TYPE>(args)` (python_udf.rs:15-17 documents the
    * syntax; builder resolves it against module `python_udf` on
    * `$VIRTUAL_ENV`) into the arity-independent registered form
    * `name(struct(args))`, registering `name` through
    * [[graft.functions.PyUdf]] on first sight. Scans stripped text so
    * string literals can't trip it; `<type>` must be one of the
    * reference's return-type keywords, so ordinary `a < b` comparisons
    * never match.
    */
  private val pyUdfCall =
    ("(?i)\\b([A-Za-z_][A-Za-z_0-9]*)\\s*<\\s*" +
     "(int8|int|uint|i128|u128|float|boolean|string|text|binary" +
     // reference-rejected return types still parse as the UDF syntax so
     // the "Unsupported return type" parity error fires (python_udf.rs:74-77)
     "|decimal|date|timestamp|point|duration|json)\\s*>\\s*\\(").r

  def rewritePythonUdfs(sql: String, spark: SparkSession): String = {
    val bare = stripStrings(sql)
    pyUdfCall.findFirstMatchIn(bare) match {
      case None => sql
      case Some(m) =>
        val (name, retType) = (m.group(1), m.group(2))
        var depth = 1
        var i = m.end
        while (depth > 0 && i < sql.length) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _   =>
          }
          i += 1
        }
        if (depth != 0)
          throw new GraftSqlException(s"unbalanced parentheses in $name<$retType>(…)")
        val args = sql.substring(m.end, i - 1).trim
        graft.functions.PyUdf.register(spark, name, retType)
        val call = s"$name(struct($args))"
        // re-scan: later calls (and python calls nested in args) rewrite too
        rewritePythonUdfs(sql.substring(0, m.start) + call + sql.substring(i), spark)
    }
  }

  /** Find first `FN(...)` call of the given names; returns
    * (fn, startOffset, endOffsetExclusive, topLevelArgs).
    */
  def findCall(sql: String, names: Set[String]): Option[(String, Int, Int, Seq[String])] = {
    val bare = stripStrings(sql).toUpperCase
    names.iterator.flatMap { fn =>
      val re = ("\\b" + fn + "\\s*\\(").r
      re.findFirstMatchIn(bare).map { m =>
        var depth = 1
        var i = m.end
        val args = mutable.ArrayBuffer.empty[String]
        var argStart = m.end
        while (depth > 0 && i < sql.length) {
          sql.charAt(i) match {
            case '\'' => // opaque string literal: a comma inside
              // 'view,click' is argument CONTENT, not a separator
              i += 1
              while (i < sql.length && sql.charAt(i) != '\'') i += 1
            case '(' => depth += 1
            case ')' =>
              depth -= 1
              if (depth == 0) args += sql.substring(argStart, i)
            case ',' if depth == 1 =>
              args += sql.substring(argStart, i); argStart = i + 1
            case _ =>
          }
          i += 1
        }
        (fn, m.start, i, args.toSeq)
      }
    }.toSeq.sortBy(_._2).headOption
  }
}
