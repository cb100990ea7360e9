package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing removes the shuffle from repeated co-located joins — the
  * storage-layout lever SCALE.md prescribes for 100 TB fact-fact joins.
  * This proves the engine's outputs can use it: two tables bucketed on
  * the join key produce a join plan with no shuffle exchange on either
  * side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  test("bucketed tables join without a shuffle exchange") {
    // managed tables land in the default ./spark-warehouse (static conf;
    // gitignored) — dropped at the end
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
    // disable auto-broadcast so the bucket join is what we observe
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      joined.queryExecution.executedPlan.toString
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    // and it computes the right thing
    val n = withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(joined.count())
    assert(n == Tables.load(spark, dir, "lineitem").count())
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
