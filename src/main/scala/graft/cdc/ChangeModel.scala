package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC change model: dozer's `Operation::{Insert, Delete, Update}`
  * (reference: dozer-types/src/types/mod.rs:293-298) re-expressed as a
  * change DataFrame — payload columns plus:
  *
  *   - `_op`:  "insert" | "delete" | "update_preimage" | "update_postimage"
  *             (Delta CDF naming; dozer Update{old,new} = a preimage row
  *             and a postimage row with the same `_seq`)
  *   - `_seq`: monotonically increasing per key — dozer's
  *             `OpIdentifier{txid, seq_in_tx}` (dozer-types/src/node.rs:81-86)
  *
  * Scale: every transform here is a single hash shuffle on the key
  * columns (window or groupBy); no driver-side state, no collect.
  */
object ChangeModel {
  val OpCol = "_op"
  val SeqCol = "_seq"

  val Insert = "insert"
  val Delete = "delete"
  val UpdatePre = "update_preimage"
  val UpdatePost = "update_postimage"

  /** +1 for rows that add to state, -1 for rows that retract — the same
    * contract as dozer's `Aggregator::{insert, delete}` retraction API
    * (dozer-sql/src/aggregation/aggregator.rs:30-35).
    */
  def weight(op: Column): Column =
    when(op.isin(Insert, UpdatePost), lit(1L))
      .when(op.isin(Delete, UpdatePre), lit(-1L))
      .otherwise(lit(0L))

  /** Materialize current state from a change stream: keep, per key, the
    * highest-`_seq` surviving image. Postimage outranks preimage at equal
    * seq. Mirrors dozer's PK-lookup record store semantics
    * (dozer-core/src/record_store.rs:29-87).
    *
    * One shuffle (window on key); at scale this is the same plan Spark
    * uses for any latest-by-key dedup, AQE-coalesced.
    */
  def applyChanges(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    latestImages(changes, keyCols).drop(OpCol, SeqCol)

  /** Like [[applyChanges]] but keeps `_op`/`_seq` (normalized to an
    * insert image) so the result can re-enter a later merge — the shape
    * an upsert sink persists between microbatches.
    */
  def latestImages(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val opRank = when(col(OpCol) === UpdatePost, 2)
      .when(col(OpCol) === Insert, 2)
      .otherwise(1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(SeqCol).desc, opRank.desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(OpCol).isin(Insert, UpdatePost))
      .drop("_rn")
      .withColumn(OpCol, lit(Insert))
  }

  /** One FINAL row per key INCLUDING terminal deletes — unlike
    * [[latestImages]], a key whose last change is a delete survives as
    * a `_op = delete` row instead of vanishing. This is the split an
    * external MERGE sink needs: `_op = insert` rows are the images to
    * upsert, `_op = delete` rows are the keys to remove. (A terminal
    * bare update_preimage — malformed without its postimage — also
    * classifies as delete, the same treatment latestImages gives it.)
    */
  def latestRows(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val opRank = when(col(OpCol) === UpdatePost, 2)
      .when(col(OpCol) === Insert, 2)
      .otherwise(1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(SeqCol).desc, opRank.desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn(OpCol,
        when(col(OpCol).isin(Insert, UpdatePost), lit(Insert))
          .otherwise(lit(Delete)))
  }

  /** Interpret a plain keyed table as a change stream of upserts plus
    * deletes flagged by `deleteWhen` — handy for replaying an
    * append-only log (e.g. the events table) through CDC operators.
    */
  def fromLog(log: DataFrame, seq: Column, deleteWhen: Column): DataFrame =
    log
      .withColumn(OpCol, when(deleteWhen, Delete).otherwise(UpdatePost))
      .withColumn(SeqCol, seq)

  /** Retraction-correct aggregation over a change stream: each measure is
    * folded with the row's ±1 weight, exactly like dozer's incremental
    * hash aggregation (dozer-sql/src/aggregation/processor.rs:48-586) but
    * executed as one Spark hash-aggregate (partial aggregation map-side,
    * single shuffle).
    *
    * Returns groups with net count > 0 (a fully-retracted group leaves
    * state, matching dozer emitting a Delete for it).
    */
  def aggregate(
      changes: DataFrame,
      groupCols: Seq[Column],
      measures: Seq[(String, Column)]): DataFrame = {
    val wCol = weight(col(OpCol))
    val aggs = measures.map { case (name, value) =>
      sum(value * wCol).as(name)
    } :+ sum(wCol).as("_net_count")
    changes
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("_net_count") > 0)
  }
}
