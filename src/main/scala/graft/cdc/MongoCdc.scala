package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative decoder for MongoDB change-stream events — the JSON
  * documents `collection.watch()` emits (documented in the MongoDB
  * manual, "Change Events"). The reference consumes this surface
  * through the mongodb driver (dozer-ingestion/mongodb/src/lib.rs:
  * 215-250 maps OperationType Insert/Update/Replace/Delete to
  * operations, Drop/Rename/Invalidate to a stream-invalidated error);
  * here the whole decode is `from_json` + Column expressions — no UDF,
  * fully codegen'd, map-only at any scale.
  *
  * Envelope fields used (change-event schema):
  *   - `operationType`: insert | update | replace | delete | drop |
  *     rename | dropDatabase | invalidate
  *   - `ns.db` / `ns.coll`: namespace, filtered against the selection
  *   - `documentKey`: the key document (always present)
  *   - `fullDocument`: present on insert/replace always; on update only
  *     when the stream runs with `fullDocument: updateLookup` — the
  *     reference requires that mode (change_event_fields errors without
  *     it) and so does the oracled path here
  *   - `updateDescription.updatedFields` / `.removedFields`: the delta
  *     form; used as fallback per-field when fullDocument is absent
  *   - `clusterTime.$timestamp.{t,i}`: BSON timestamp → `_seq` =
  *     (t << 32) | i, the resume-token ordering analogue
  *
  * Operation mapping (reference parity, lib.rs:224-250):
  *   insert → Insert; update/replace → UpdatePre (key-only) +
  *   UpdatePost (full document); delete → Delete (key-only);
  *   drop/rename/dropDatabase/invalidate → loud error, the
  *   ReplicationStreamInvalidated analogue.
  */
object MongoCdc extends Serializable {

  /** The extended-JSON envelope schema for a given row schema. */
  private def envelopeSchema(rowSchema: StructType): StructType =
    StructType(Seq(
      StructField("operationType", StringType),
      StructField("ns", StructType(Seq(
        StructField("db", StringType), StructField("coll", StringType)))),
      StructField("documentKey", rowSchema),
      StructField("fullDocument", rowSchema),
      StructField("updateDescription", StructType(Seq(
        StructField("updatedFields", rowSchema),
        StructField("removedFields", ArrayType(StringType))))),
      StructField("clusterTime", StructType(Seq(
        StructField("$timestamp", StructType(Seq(
          StructField("t", LongType), StructField("i", LongType)))))))))

  /** Decode change-stream event JSON — `events(valueCol)` one event per
    * row — into ChangeModel change rows with real columns (rowSchema
    * fields + `_op` + `_seq`) for db.coll. Unselected namespaces are
    * dropped; an invalidating event (drop/rename/dropDatabase/
    * invalidate) for the SELECTED namespace raises at decode time.
    */
  def changes(events: DataFrame, valueCol: String, db: String, coll: String,
      rowSchema: StructType, keyFields: Seq[String]): DataFrame = {
    // ONE parse, ONE pass: each event maps to an array of 0-2 change
    // structs, exploded — no per-branch re-scan of the JSON
    val env = events
      .select(from_json(col(valueCol), envelopeSchema(rowSchema)).as("e"))
      .filter(col("e.ns.db") === db && col("e.ns.coll") === coll)
    val ts = col("e.clusterTime").getField("$timestamp")
    val seq = ts.getField("t") * lit(4294967296L) + ts.getField("i")
    val op = col("e.operationType")

    def field(f: StructField, image: String): Column = {
      val full = col(s"e.fullDocument.${f.name}")
      val updated = col(s"e.updateDescription.updatedFields.${f.name}")
      val keyed = col(s"e.documentKey.${f.name}")
      val removed = coalesce(
        array_contains(col("e.updateDescription.removedFields"), f.name),
        lit(false))
      image match {
        case "post" =>
          // update without updateLookup: per-field delta over the key;
          // a removedFields hit is an explicit null
          when(removed, lit(null).cast(f.dataType))
            .otherwise(coalesce(full, updated, keyed))
        case "key" => keyed
      }
    }
    def chg(image: String, opName: String): Column =
      struct(rowSchema.fields.toSeq.map(f => field(f, image).as(f.name)) :+
        lit(opName).as(ChangeModel.OpCol) :+
        seq.as(ChangeModel.SeqCol): _*)

    val arrType = ArrayType(StructType(
      rowSchema.fields.toSeq :+
        StructField(ChangeModel.OpCol, StringType) :+
        StructField(ChangeModel.SeqCol, LongType)))
    val arr =
      when(op === "insert", array(chg("post", ChangeModel.Insert)))
        .when(op.isin("update", "replace"),
          array(chg("key", ChangeModel.UpdatePre),
            chg("post", ChangeModel.UpdatePost)))
        .when(op === "delete", array(chg("key", ChangeModel.Delete)))
        // stream invalidation for the selected namespace fails loudly —
        // the ReplicationStreamInvalidated analogue; raise_error sits in
        // the invalid branch so it only evaluates on poisoned rows
        .when(op.isin("drop", "rename", "dropDatabase", "invalidate"),
          raise_error(concat(lit("mongodb change stream invalidated by '"),
            op, lit(s"' on $db.$coll"))).cast(arrType))
        .otherwise(array().cast(arrType)) // forward-compat event kinds
    env.select(explode(arr).as("c")).select(col("c.*"))
  }

  /** Decode + materialize current collection state. */
  def materialize(events: DataFrame, valueCol: String, db: String,
      coll: String, rowSchema: StructType, keyFields: Seq[String]): DataFrame =
    ChangeModel.applyChanges(
      changes(events, valueCol, db, coll, rowSchema, keyFields), keyFields)
}
