package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope decoder: the standard JSON change-event shape
  * Debezium publishes for Postgres WAL / MySQL binlog — the log-based
  * CDC feed at the heart of the reference's ingestion story
  * (dozer-ingestion/postgres/src/replicator.rs decodes the same WAL
  * events natively; message shape mirrors
  * dozer-types/src/models/ingestion_types.rs:21-46).
  *
  * Accepted input per record (a Kafka `value` or one line of a JSON
  * change file), either wrapped or flat:
  *
  * {{{
  * {"payload": {"op":"u", "before":{...}, "after":{...},
  *              "source":{"lsn":123,"ts_ms":...}, "ts_ms":...}}
  * {"op":"c", "after":{...}, "source":{...}}
  * }}}
  *
  * Output: one change row per image in [[ChangeModel]]'s contract —
  * payload columns flattened, plus `_op` (insert / delete /
  * update_preimage / update_postimage) and `_seq`:
  *
  *   - `op: c` (create) and `op: r` (snapshot read — Debezium's
  *     initial-snapshot phase, dozer's `SnapshottingStarted..Done`
  *     window, ingestion_types.rs:41-45) → one insert image of `after`
  *   - `op: u` → an update_preimage of `before` and an
  *     update_postimage of `after` sharing one `_seq`
  *   - `op: d` → one delete image of `before`
  *   - unknown ops and Kafka tombstones (null/unparseable value) →
  *     dropped
  *
  * `_seq` defaults to `coalesce(source.lsn, source.pos, source.ts_ms,
  * ts_ms)` — Postgres LSN first, then MySQL binlog position (NOTE:
  * `pos` alone is only monotonic within one binlog file; pass an
  * explicit `seq` built from file+pos when rotating files matter),
  * then timestamps.
  *
  * A `u` event whose `before` is null (Postgres table without
  * `REPLICA IDENTITY FULL`) still yields its postimage; the all-null
  * preimage carries no values to retract, so retraction-correct
  * aggregates over such a feed need the identity set — same
  * requirement the reference's Postgres connector has.
  *
  * Scale: one `from_json` + one `explode` per record, fully
  * whole-stage-codegen'd, no shuffle — the decoder itself never
  * becomes the bottleneck; downstream `applyChanges` does the single
  * key shuffle.
  */
object Debezium {

  /** Debezium `source` block — only the fields the decoder uses;
    * `from_json` ignores everything else (db, schema, table, txId...).
    */
  private val sourceSchema = StructType(Seq(
    StructField("lsn", LongType),
    StructField("pos", LongType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType)))

  /** The envelope around a row schema (the `payload` block when
    * `schemas.enable` wraps it).
    */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Decode a DataFrame holding Debezium JSON in `valueCol`
    * (string or binary) into [[ChangeModel]] change rows. Works
    * identically on batch and streaming inputs.
    *
    * @param rowSchema schema of the table row (the `before`/`after`
    *                  struct)
    * @param seq       override for the `_seq` expression, evaluated
    *                  against the parsed envelope columns
    *                  (`source.lsn` etc. are not in scope for the
    *                  caller — pass e.g. a column of the input frame
    *                  such as a Kafka offset)
    */
  def decode(raw: DataFrame, valueCol: String, rowSchema: StructType,
      seq: Option[Column] = None): DataFrame = {
    val env = envelopeSchema(rowSchema)
    // one parse handles both shapes: the full schema has `payload`
    // alongside the flat envelope fields, and whichever is absent
    // parses to null
    val full = StructType(StructField("payload", env) +: env.fields)
    // explode(array(..)) materializes the parsed envelope as a generator
    // output: the ~8 downstream references (images per op branch, seq
    // fallbacks) extract fields from the materialized struct instead of
    // each inlining — and re-running — the from_json (the q78 lesson:
    // projection collapse + pushdown multiply an inlined parse 4x)
    val p = raw.select(col("*"),
      explode(array(from_json(col(valueCol).cast("string"), full)))
        .as("__dbz"))
    val flatEnv = struct(
      col("__dbz.before").as("before"),
      col("__dbz.after").as("after"),
      col("__dbz.source").as("source"),
      col("__dbz.op").as("op"),
      col("__dbz.ts_ms").as("ts_ms"))
    val withEnv = p.withColumn("__env",
      when(col("__dbz.payload.op").isNotNull, col("__dbz.payload"))
        .otherwise(flatEnv))
    val seqCol = seq.getOrElse(coalesce(
      col("__env.source.lsn"), col("__env.source.pos"),
      col("__env.source.ts_ms"), col("__env.ts_ms")))
    def img(field: String, op: String) =
      struct(col(s"__env.$field").as("img"), lit(op).as("op"))
    val emptyChange = array().cast(ArrayType(StructType(Seq(
      StructField("img", rowSchema), StructField("op", StringType)))))
    withEnv
      .withColumn("__seq", seqCol)
      .withColumn("__change", explode(
        when(col("__env.op") === "u", array(
          img("before", ChangeModel.UpdatePre),
          img("after", ChangeModel.UpdatePost)))
        .when(col("__env.op").isin("c", "r"),
          array(img("after", ChangeModel.Insert)))
        .when(col("__env.op") === "d",
          array(img("before", ChangeModel.Delete)))
        .otherwise(emptyChange)))
      .select(col("__change.img.*"),
        col("__change.op").as(ChangeModel.OpCol),
        col("__seq").as(ChangeModel.SeqCol))
  }

  /** Dead-letter companion to [[decode]]: the raw rows decode silently
    * drops — unparseable JSON, or an envelope with no recognizable op
    * in either the flat or payload-wrapped position. Route these to a
    * reject sink; at scale, silent drops on a CDC feed are data loss
    * with no signal (the same observability contract as the capped
    * LSH/SimHash indexes' coverage rows).
    */
  def malformed(raw: DataFrame, valueCol: String): DataFrame = {
    val probe = StructType(Seq(
      StructField("op", StringType),
      StructField("payload", StructType(Seq(StructField("op", StringType))))))
    val p = from_json(col(valueCol).cast("string"), probe)
    raw.filter(p.isNull ||
      (p.getField("op").isNull && p.getField("payload").getField("op").isNull))
  }

  /** Encode change rows back into flat Debezium JSON — the inverse of
    * [[decode]] for round-trip tests and for emitting a graft result
    * as a CDC feed a Debezium consumer understands. Update pre/post
    * pairs sharing a `_seq` fold into one `u` event.
    */
  def encode(changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = changes.columns
      .filterNot(c => c == ChangeModel.OpCol || c == ChangeModel.SeqCol)
    val rowStruct = struct(payload.toIndexedSeq.map(col): _*)
    val rowType = StructType(changes.schema.fields
      .filterNot(f => f.name == ChangeModel.OpCol || f.name == ChangeModel.SeqCol))
    val pre = changes.filter(col(ChangeModel.OpCol) === ChangeModel.UpdatePre)
      .select(keyCols.map(col) :+ col(ChangeModel.SeqCol) :+
        rowStruct.as("__before"): _*)
    val nonPre = changes.filter(col(ChangeModel.OpCol) =!= ChangeModel.UpdatePre)
    val joined = nonPre.join(pre, keyCols :+ ChangeModel.SeqCol, "left")
    joined.select(to_json(struct(
      when(col(ChangeModel.OpCol) === ChangeModel.Delete, rowStruct)
        .otherwise(col("__before")).as("before"),
      when(col(ChangeModel.OpCol) === ChangeModel.Delete,
        lit(null).cast(rowType))
        .otherwise(rowStruct).as("after"),
      struct(col(ChangeModel.SeqCol).as("lsn")).as("source"),
      when(col(ChangeModel.OpCol) === ChangeModel.Delete, "d")
        .when(col(ChangeModel.OpCol) === ChangeModel.UpdatePost, "u")
        .otherwise("c").as("op"))).as("value"))
  }
}
