package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decoder for Snowflake table-stream rows — the `SELECT * FROM
  * <stream>` shape with the three `METADATA$` columns (documented in
  * the Snowflake manual, "Introduction to Streams"). The reference
  * consumes exactly this (dozer-ingestion/snowflake/src/
  * stream_consumer.rs:62-92: METADATA$ACTION INSERT → Insert, DELETE →
  * Delete, data columns = all but the trailing three), re-expressed as
  * Column expressions — map-only, codegen'd.
  *
  * Two modes:
  *   - `changes` (reference parity): INSERT → Insert, DELETE → Delete;
  *     an update appears as its delete+insert pair, which [[ChangeModel
  *     .applyChanges]] replays correctly given seq ordering.
  *   - `changesPaired`: additionally folds `METADATA$ISUPDATE = true`
  *     rows into UpdatePre/UpdatePost sharing the row id — the richer
  *     envelope the stream actually encodes.
  *
  * `_seq` comes from a caller-named ordering column (the consumption
  * iteration × row position — stream_consumer.rs's OpIdentifier
  * (iteration, idx)); Snowflake streams have no in-row LSN.
  */
object SnowStream extends Serializable {

  val Action = "METADATA$ACTION"
  val IsUpdate = "METADATA$ISUPDATE"
  val RowId = "METADATA$ROW_ID"

  private def meta(df: DataFrame): Seq[String] =
    df.columns.filterNot(c => c == Action || c == IsUpdate || c == RowId)
      .toSeq

  /** Reference-parity mapping: every stream row is one change row. An
    * unknown action is a loud error (UnsupportedActionInStream).
    */
  def changes(stream: DataFrame, seqCol: String): DataFrame = {
    val dataCols = meta(stream).filterNot(_ == seqCol)
    val op = when(upper(col(Action)) === "INSERT", lit(ChangeModel.Insert))
      .when(upper(col(Action)) === "DELETE", lit(ChangeModel.Delete))
      .otherwise(raise_error(concat(
        lit("snowflake stream: unsupported METADATA$ACTION '"),
        col(Action), lit("'"))))
    stream.select(dataCols.map(col) :+
      op.as(ChangeModel.OpCol) :+
      col(seqCol).cast("long").as(ChangeModel.SeqCol): _*)
  }

  /** ISUPDATE-aware mapping: the update pair becomes UpdatePre (the
    * DELETE half) + UpdatePost (the INSERT half) sharing `_seq` —
    * requires the caller's seq to be equal for the two halves (they
    * share METADATA$ROW_ID in a real stream).
    */
  def changesPaired(stream: DataFrame, seqCol: String): DataFrame = {
    val dataCols = meta(stream).filterNot(_ == seqCol)
    val isUpd = coalesce(col(IsUpdate).cast("boolean"), lit(false))
    val op = when(upper(col(Action)) === "INSERT",
        when(isUpd, lit(ChangeModel.UpdatePost)).otherwise(lit(ChangeModel.Insert)))
      .when(upper(col(Action)) === "DELETE",
        when(isUpd, lit(ChangeModel.UpdatePre)).otherwise(lit(ChangeModel.Delete)))
      .otherwise(raise_error(concat(
        lit("snowflake stream: unsupported METADATA$ACTION '"),
        col(Action), lit("'"))))
    stream.select(dataCols.map(col) :+
      op.as(ChangeModel.OpCol) :+
      col(seqCol).cast("long").as(ChangeModel.SeqCol): _*)
  }

  /** Decode + materialize current state for the streamed table. */
  def materialize(stream: DataFrame, seqCol: String,
      keyCols: Seq[String]): DataFrame =
    ChangeModel.applyChanges(changesPaired(stream, seqCol), keyCols)
}
