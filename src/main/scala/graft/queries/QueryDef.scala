package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver replays in DuckDB.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Shared helpers for deterministic cross-engine results (see SparkEntry). */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Exact sum of a 2-decimal money/quantity double, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(12, 2))).cast("double")

  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
}
