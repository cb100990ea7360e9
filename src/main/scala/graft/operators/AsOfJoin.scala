package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the latest right row with
  * rightTs <= leftTs on the same key — the time-alignment operator
  * Spark lacks natively (financial ticks, CDC snapshot alignment,
  * feature-at-event-time joins).
  *
  * Implementation is the scalable sort-based composition (preference
  * order (a) of the custom-operator guidance): tag and union both
  * sides, one hash shuffle on the key, one per-partition sort on
  * (ts, side), then a running `last(right, ignoreNulls)` window carries
  * the newest right image onto each left row. O(n log n) per key group,
  * no range self-join blowup; skew handling falls out of AQE on the
  * single exchange.
  *
  * Ties: right rows at the same (key, ts) resolve by sort order —
  * pre-deduplicate the right side (e.g. max_by) for deterministic
  * output.
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightSuffix: String = ""): DataFrame = {
    // Flattening both sides into one row demands unambiguous names:
    // shared columns (typically the key/ts themselves) must either not
    // exist or be disambiguated by suffixing the right side.
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty || rightSuffix.nonEmpty,
      s"left and right share columns ${overlap.mkString(", ")}; " +
        "pass rightSuffix to disambiguate the right-side output columns")
    val rightType = StructType(right.schema.fields)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__is_left"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__is_left"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    // at equal ts the right row sorts first, so rightTs == leftTs matches
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        left.columns.map(c => col("__l").getField(c).as(c)) ++
        right.columns.map(c => col("__match").getField(c)
          .as(if (overlap(c)) c + rightSuffix else c)): _*)
  }
}
