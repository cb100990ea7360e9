package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{SqlLogicParser, SqlLogicRunner}

/** Replays the reference engine's own sqllogictest corpus
  * (dozer-tests/src/sql_tests/full *.test files) against Spark SQL via
  * [[SqlLogicRunner]] — the "matches the reference's results on its own
  * test queries" gate, on the reference's actual test files rather than
  * hand-ported copies.
  *
  * py_udf.test replays through SQL scalar UDFs: the corpus's Python
  * bodies (dozer-tests/python_udf/python_udf.py — `add(a)=a+1`,
  * `sum(a,b)=a+b`) are declared as the equivalent `CREATE FUNCTION
  * ... RETURN` expressions, and the dozer `fn<type>(...)` return-type
  * annotation is a dialect rewrite. The Python RUNTIME stays a
  * documented out-of-scope delta (SURVEY §8) — what's replayed is the
  * corpus semantics, which is what the harness checks.
  * Records tagged `onlyif bug` are skipped exactly as the reference
  * harness skips them.
  *
  * Comparison: lines are whitespace-normalized; numeric cells compare
  * with 1e-9 relative tolerance (the expected values were produced by
  * sqlite float arithmetic, whose summation order Spark does not
  * replicate bit-for-bit — exact-hash parity is the DuckDB oracle
  * gate's job, not this suite's).
  */
class SqlLogicSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val corpus = new java.io.File(
    "/root/reference/dozer-tests/src/sql_tests/full")

  private val files = Seq("account", "agg", "aggr_append_only",
    "aggregations", "complex", "example", "functions", "join", "nested",
    "py_udf", "simple", "union")

  // the py_udf corpus functions, as declared in
  // /root/reference/dozer-tests/python_udf/python_udf.py. With a live
  // python3 the corpus replays through the REAL worker runtime
  // (graft.functions.PyUdf); without one, through SQL-expression
  // stand-ins — same semantics, so the expected blocks hold either way.
  private def registerCorpusUdfs(): Unit = {
    if (graft.functions.PyUdf.pythonAvailable) {
      val dir = graft.functions.PyUdf.ensureFixtureModule(
        """def py_add(a):
          |    return a + 1
          |def py_sum(a, b):
          |    return a + b
          |""".stripMargin, "graft_pyudf_corpus")
      spark.conf.set("spark.graft.python_udf.dir", dir)
    } else {
      GraftApp.registerUdfs(spark, GraftApp.GraftConfig(
        sources = Nil, sql = "", sinks = Nil,
        udfs = Seq(
          GraftApp.UdfConf("py_add", "a DOUBLE", "DOUBLE", "a + 1"),
          GraftApp.UdfConf("py_sum", "a DOUBLE, b DOUBLE", "DOUBLE", "a + b"))))
    }
  }

  private def norm(s: String): String = s.trim.replaceAll("\\s+", " ")

  private def toD(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: NumberFormatException => None }

  private def linesMatch(exp: String, act: String): Boolean = {
    if (exp == act) return true
    val te = exp.split(" "); val ta = act.split(" ")
    te.length == ta.length && te.zip(ta).forall { case (e, a) =>
      e == a || ((toD(e), toD(a)) match {
        case (Some(de), Some(da)) =>
          math.abs(de - da) <=
            1e-9 * math.max(1.0, math.max(math.abs(de), math.abs(da)))
        case _ => false
      })
    }
  }

  files.foreach { f =>
    test(s"reference sqllogictest corpus: $f.test") {
      val content = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(corpus, s"$f.test").toPath))
      val records = SqlLogicParser.parse(content)
      if (f == "py_udf") registerCorpusUdfs()
      try {
      val runner = new SqlLogicRunner(spark)
      var nQueries = 0
      records.foreach {
        case SqlLogicParser.Statement(sql, line) =>
          withClue(s"$f.test:$line statement:\n$sql\n") {
            runner.statement(sql)
          }
        case SqlLogicParser.Query(sql, expected, rowsort, line) =>
          withClue(s"$f.test:$line query:\n$sql\n") {
            val actual = runner.query(sql).map(norm)
            val exp = expected.map(norm)
            val (e2, a2) =
              if (rowsort) (exp.sorted, actual.sorted) else (exp, actual)
            assert(a2.length == e2.length,
              s"row count ${a2.length} != ${e2.length}\nexpected:\n${e2.mkString("\n")}\nactual:\n${a2.mkString("\n")}")
            e2.zip(a2).foreach { case (e, a) =>
              assert(linesMatch(e, a), s"expected `$e` got `$a`")
            }
            nQueries += 1
          }
      }
      // The reference harness feeds queries from the change log through
      // its incremental pipeline; assert our CDC layer reconstructs the
      // exact table states from the same log (insert/update/delete ops
      // with synthetic row identity) after the full mutation history.
      val batch = runner.batchStates()
      runner.cdcStates().foreach { case (table, rebuilt) =>
        withClue(s"$f.test CDC replay of '$table': ") {
          val want = batch(table).map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
          val got = rebuilt.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
          assert(got == want,
            s"CDC-rebuilt state diverges\nwant: $want\ngot:  $got")
        }
      }
      info(s"$f.test: ${records.size} records, $nQueries queries verified, " +
        s"${batch.size} tables CDC-replay checked")
      } finally if (f == "py_udf") spark.conf.unset("spark.graft.python_udf.dir")
    }
  }
}
