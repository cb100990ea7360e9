package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in [[graft.queries]] (one object per SURVEY §2
  * area); this object flattens it into the driver's Map surface.
  *
  * Determinism conventions (so DuckDB/Spark hash-match):
  *  - monetary/quantity doubles are cast to exact decimals *before*
  *    arithmetic/aggregation, then the final value is cast back to
  *    double — decimal addition is associative, so shuffle order
  *    doesn't change the result;
  *  - averages are exact-decimal sums divided by counts in double;
  *  - every computed column is aliased identically on both sides;
  *  - no ROUND on raw doubles (BigDecimal-string vs float rounding
  *    semantics differ across engines).
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    RelationalQueries.all ++ ExpressionQueries.all ++ CdcQueries.all ++
      PipelineQueries.all ++ DialectQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
