package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  private def naive = {
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.join(sup,
      col("c_acctbal") >= col("s_acctbal") &&
        col("c_acctbal") < col("s_acctbal") + 500)
  }

  test("pointInInterval equals the nested-loop range join") {
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"),
        (col("s_acctbal") + 500).as("s_hi"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val binned = RangeJoin.pointInInterval(
      cust, "c_acctbal", sup, "s_acctbal", "s_hi", binWidth = 350.0)
      .select(col("c_custkey"), col("s_suppkey"))
    val expected = naive.select(col("c_custkey"), col("s_suppkey"))
    assert(binned.count() == expected.count())
    assert(binned.exceptAll(expected).isEmpty && expected.exceptAll(binned).isEmpty)
  }

  test("pointInInterval survives negative domains and empty intervals") {
    import spark.implicits._
    val pts = Seq((-5.0, "a"), (0.0, "b"), (7.5, "c")).toDF("p", "pid")
    val ivs = Seq((-10.0, -1.0, "neg"), (5.0, 5.0, "empty"), (-1.0, 8.0, "wide"))
      .toDF("lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", binWidth = 3.0)
      .select($"pid", $"iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "neg"), ("b", "wide"), ("c", "wide")))
  }

  test("RewriteRangeJoin turns the nested-loop plan into a binned equi join") {
    spark.conf.set("spark.graft.rangeJoin.binWidth", "500")
    try {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"expected no nested-loop join in:\n$plan")
      // results identical to the rule-off nested loop
      val on = naive.select(col("c_custkey"), col("s_suppkey"))
      val onRows = on.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      val off = naive.select(col("c_custkey"), col("s_suppkey"))
      val offRows = off.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(onRows == offRows && onRows.nonEmpty)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("RewriteRangeJoin leaves equi joins and outer range joins alone") {
    spark.conf.set("spark.graft.rangeJoin.binWidth", "500")
    try {
      import spark.implicits._
      val l = Seq((1L, 5.0)).toDF("lk", "lp")
      val r = Seq((1L, 0.0, 10.0)).toDF("rk", "rlo", "rhi")
      // equi key present: Catalyst already hash-joins; rule must not fire
      val equi = l.join(r, $"lk" === $"rk" && $"lp" >= $"rlo" && $"lp" < $"rhi")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // non-inner: rule must not fire (rewrite is inner-only)
      val outer = l.join(r, $"lp" >= $"rlo" && $"lp" < $"rhi", "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // the inner no-equi shape does fire
      val inner = l.join(r, $"lp" >= $"rlo" && $"lp" < $"rhi")
      assert(inner.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }
}
