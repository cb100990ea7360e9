package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter-funnel attrition report — the per-stage drop accounting every
  * training-data curation pipeline publishes next to its dataset card
  * (reference: the staged filter chains behind dozer's curation-style
  * pipelines, e.g. dozer-sql selection chains; the *report* itself is the
  * standard corpus-release artifact: how many documents each quality gate
  * removed, in order).
  *
  * Semantics: stages are CUMULATIVE — a document is counted as passing
  * stage k only if it passed stages 1..k-1 too, so `n_in` of stage k is
  * `n_pass` of stage k-1 and the report reads as a monotone funnel.
  * An optional terminal exact-dedup stage keeps the lowest id per
  * dedup-key group among the survivors of the last predicate stage.
  *
  * 100 TB shape: every predicate is evaluated in ONE pass over the input
  * (codegen'd conditional sums with map-side partial aggregation; the
  * final reduce moves #stages longs per partition, not rows). The only
  * shuffle is the optional dedup stage's hash partition on the dedup key
  * — the same shuffle any exact dedup pays — and the output is O(#stages)
  * rows regardless of input size.
  */
object Funnel {

  /** Per-stage attrition over cumulative predicate `stages` (name ->
    * predicate), with an optional terminal keep-min-id exact-dedup stage
    * on `dedupKey` (e.g. `md5(col("text"))`).
    *
    * Output: `stage_id INT, stage STRING, n_in BIGINT, n_pass BIGINT,
    * n_drop BIGINT`, one row per stage in order.
    */
  def report(
      df: DataFrame,
      idCol: String,
      stages: Seq[(String, Column)],
      dedupKey: Option[Column] = None): DataFrame =
    reportByGroup(df, idCol, Nil, stages, dedupKey)

  /** Per-GROUP attrition — [[report]] broken out by `groupCols` (the
    * per-language/per-source rows a dataset card publishes). Identical
    * single-scan flag machinery; the group keys ride into the final
    * aggregation (still map-side partial) and output is
    * O(#groups × #stages). The optional exact-dedup stage keeps its
    * GLOBAL canonical (min id per dedup key): a text duplicated across
    * groups still keeps exactly one copy corpus-wide, counted in the
    * keeper's group — the semantics a cross-source dedup report needs.
    */
  def reportByGroup(
      df: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      stages: Seq[(String, Column)],
      dedupKey: Option[Column] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // the stage machinery adds internal __s<i> flag columns and __c<i>
    // count aliases; an input (or group) column with one of those names
    // would be silently overwritten / made ambiguous and corrupt the
    // attrition counts — refuse loudly instead
    val clash = df.columns.filter(_.matches("__[sc]\\d+"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Funnel's " +
        "internal __s<i>/__c<i> working columns; rename them before " +
        "calling report")
    val names = stages.map(_._1) ++ dedupKey.map(_ => "exact_dedup")
    val total = names.size

    // cumulative pass flags: __s1..__sK as 0/1 longs (null-safe — a null
    // predicate, e.g. from null text, counts as a drop on both engines)
    var flagged = df
    var chain: Column = lit(true)
    stages.zipWithIndex.foreach { case ((_, pred), i) =>
      chain = chain && pred
      flagged = flagged.withColumn(s"__s${i + 1}", when(chain, 1L).otherwise(0L))
    }
    dedupKey.foreach { key =>
      val k = stages.size
      val survivor = col(s"__s$k") === 1L
      val canon = min(when(survivor, col(idCol))).over(Window.partitionBy(key))
      flagged = flagged.withColumn(s"__s${k + 1}",
        when(survivor && col(idCol) === canon, 1L).otherwise(0L))
    }

    val aggs = (1 to total).map(i => sum(col(s"__s$i")).as(s"__c$i"))
    val totals =
      if (groupCols.isEmpty) flagged.agg(count(lit(1)).as("__c0"), aggs: _*)
      else flagged.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__c0"), aggs: _*)

    val rows = (1 to total).map { i =>
      struct(
        lit(i).as("stage_id"),
        lit(names(i - 1)).as("stage"),
        col(s"__c${i - 1}").as("n_in"),
        col(s"__c$i").as("n_pass"))
    }
    totals
      .select(groupCols.map(col) :+ explode(array(rows: _*)).as("r"): _*)
      .select(groupCols.map(col) ++ Seq(col("r.stage_id"), col("r.stage"),
        col("r.n_in"), col("r.n_pass")): _*)
      .withColumn("n_drop", col("n_in") - col("n_pass"))
  }
}
