package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry query runs on sf0.001 plus targeted invariants.
  * Oracle-level equality is covered by Verify + the driver's DuckDB
  * gate; these are fast structural checks.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  test("registry names are unique (Map would silently drop duplicates)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length,
      names.diff(names.distinct).mkString(","))
  }

  // "all registry queries execute" moved to RegistrySweep{A,B,C,D}Spec:
  // the sweep is the suite's largest wall block and now runs sliced
  // across the parallel forked test groups (see build.sbt).

  test("every oracle references only aliased output columns") {
    // guard against the silent hash-mismatch mode: unaliased aggregates
    SparkEntry.registry.foreach { q =>
      q.oracle.foreach { sql =>
        assert(!sql.toLowerCase.matches("(?s).*select[^a-z]*sum\\([^)]*\\)\\s*,.*") ||
          sql.toLowerCase.contains(" as "), s"${q.name}: unaliased aggregate?")
      }
    }
  }

  test("q1_agg groups and exact sums") {
    val rows = SparkEntry.queries("q1_agg")(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    assert(rows.map(_.getAs[Long]("count_order")).sum > 5000)
  }

  test("q14_hop assigns every event to exactly two windows") {
    val total = SparkEntry.queries("q14_hop")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val events = Tables.load(spark, dir, "events").count()
    assert(total == 2 * events)
  }

  test("q8_union_distinct is a set") {
    val df = SparkEntry.queries("q8_union_distinct")(spark, dir)
    assert(df.count() == df.distinct().count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Q.par repartitions only on an input-parallelism deficit") {
    import org.apache.spark.sql.functions.col
    val cores = spark.sparkContext.defaultParallelism
    // single-split input (the bench-SF shape): widened to the cluster
    val narrow = spark.range(0, 100).toDF("id").coalesce(1)
    assert(queries.Q.par(spark, narrow).rdd.getNumPartitions == cores)
    // already-parallel input (the real-scale shape): NO added exchange
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_qpar_test").toString
    spark.range(0, 1000).toDF("id")
      .repartition(cores + 4).write.mode("overwrite").parquet(tmp)
    val wide = spark.read.parquet(tmp).filter(col("id") >= 0)
    val before = wide.rdd.getNumPartitions
    assert(before >= cores, s"fixture wrote too few splits: $before")
    val after = queries.Q.par(spark, wide)
    assert(after.rdd.getNumPartitions == before)
    assert(!after.queryExecution.executedPlan.toString.contains(
      "RoundRobinPartitioning"))
  }
}
