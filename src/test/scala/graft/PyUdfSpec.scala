package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PyUdf
import graft.sql.{GraftSqlRunner, SqlText}

/** Python UDF runtime (reference python_udf.rs:29-81): per-task-thread
  * python3 workers over a JSON-lines pipe, `name<type>(args)` dialect
  * syntax, typed extraction, and the reference's error parity
  * (VIRTUAL_ENV resolution, unsupported return types). Tests that need a
  * live interpreter `assume` python3 — skipped, never faked, where absent.
  */
class PyUdfSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val moduleDir = PyUdf.ensureFixtureModule(
    """def py_add(a):
      |    return a + 1.0
      |def py_sum(a, b):
      |    return a + b
      |def py_rev(s):
      |    return s[::-1]
      |def py_mask(b):
      |    return bytes(x ^ 255 for x in b)
      |def py_is_even(n):
      |    return n % 2 == 0
      |def py_opt(a):
      |    return None if a is None else a * 2
      |def py_fail(x):
      |    raise ValueError("boom %s" % x)
      |""".stripMargin, "graft_pyudf_spec")

  private def withDir[A](f: => A): A = {
    spark.conf.set("spark.graft.python_udf.dir", moduleDir)
    try f finally spark.conf.unset("spark.graft.python_udf.dir")
  }

  test("py_udf corpus semantics through the dialect syntax") {
    assume(PyUdf.pythonAvailable)
    withDir {
      import spark.implicits._
      // the reference corpus case (py_udf.test): py_add<float>(a),
      // py_sum<float>(a, b) over (2, 3) → 3, 5
      val runner = new GraftSqlRunner(spark)
      runner.registerSource("t1", Seq((2L, 3L)).toDF("a", "b"))
      val out = runner.run(
        "SELECT py_add<float>(a) AS x, py_sum<float>(a, b) AS y FROM t1 INTO o")("o")
      val r = out.collect().head
      assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 5.0)
    }
  }

  test("typed extraction: string, binary, boolean, int round-trips") {
    assume(PyUdf.pythonAvailable)
    withDir {
      import spark.implicits._
      val runner = new GraftSqlRunner(spark)
      runner.registerSource("t",
        Seq(("spark", Array[Byte](0, 1, 2), 4L)).toDF("s", "b", "n"))
      val out = runner.run(
        """SELECT py_rev<string>(s) AS rs, py_mask<binary>(b) AS mb,
          |  py_is_even<boolean>(n) AS ev, py_sum<int>(n, n) AS n2
          |FROM t INTO o""".stripMargin)("o")
      val r = out.collect().head
      assert(r.getString(0) == "kraps")
      assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](-1, -2, -3))
      assert(r.getBoolean(2))
      assert(r.getLong(3) == 8L)
    }
  }

  test("None and null flow through as SQL NULL") {
    assume(PyUdf.pythonAvailable)
    PyUdf.register(spark, "py_opt", "int", Some(moduleDir))
    import spark.implicits._
    val df = Seq(Some(21L), None).toDF("a")
      .selectExpr("py_opt(struct(a)) AS v")
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(42L, null))
  }

  test("python exceptions surface with the function name and message") {
    assume(PyUdf.pythonAvailable)
    PyUdf.register(spark, "py_fail", "int", Some(moduleDir))
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(7L).toDF("a").selectExpr("py_fail(struct(a)) AS v").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("py_fail") && msg.contains("boom 7"))
  }

  test("workers are reused across a bulk run (no per-row process spawn)") {
    assume(PyUdf.pythonAvailable)
    PyUdf.register(spark, "py_sum", "int", Some(moduleDir))
    val n = 20000L
    val out = spark.range(n).selectExpr("py_sum(struct(id, id)) AS v")
      .agg(sum("v")).collect().head.getLong(0)
    assert(out == n * (n - 1)) // sum of 2*id
  }

  test("reference error parity: missing VIRTUAL_ENV and unsupported types") {
    // type check fires before env resolution, so no interpreter needed
    val e1 = intercept[IllegalArgumentException] {
      PyUdf.register(spark, "f", "timestamp")
    }
    assert(e1.getMessage.contains("Unsupported return type"))
    if (!sys.env.contains("VIRTUAL_ENV")) {
      val e2 = intercept[IllegalStateException] {
        PyUdf.register(spark, "f", "int")
      }
      assert(e2.getMessage.contains("VIRTUAL_ENV"))
    }
  }

  test("rewrite is quote-safe and leaves plain comparisons alone") {
    // string literal containing the syntax must not rewrite
    val sql = "SELECT 'py_add<int>(x)' AS lit, a < b AS cmp FROM t"
    assert(SqlText.rewritePythonUdfs(sql, spark) == sql)
  }
}
