package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNAPSHOT DIFF → CDC: derive the change feed that transforms one
  * table snapshot into another — the seam behind every re-snapshot
  * connector (the reference's object-store sources re-list and re-read;
  * turning consecutive snapshots into Insert/Delete/Update ops is what
  * lets the rest of the pipeline stay incremental; same role as
  * Debezium's snapshot-then-stream handoff but computed, not captured).
  *
  * Emits, in [[ChangeModel]]'s op vocabulary: one `insert` per key only
  * in the new snapshot, one `delete` (old image) per key only in the
  * old, one `update_postimage` (new image) per key in both whose value
  * columns differ — nothing for identical rows. The postimage alone is
  * sufficient for keyed merge ([[ChangeModel.applyChanges]] ranks it
  * like an insert), so `applyChanges(old-as-inserts ∪ diff)` rebuilds
  * the new snapshot exactly — the spec's round-trip law.
  *
  * 100 TB shape: ONE full-outer hash join on the key columns — the
  * shuffle any snapshot comparison pays — with change classification as
  * codegen'd null checks and one null-safe struct equality over the
  * value columns. Keys must be non-null; schemas must match.
  */
object SnapshotDiff {

  def changes(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      seq: Long = 1L): DataFrame = {
    require(keyCols.nonEmpty, "snapshot diff needs key columns")
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs " +
        newDf.columns.mkString(","))
    val valueCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    // enforce the documented keys-must-be-non-null precondition: a
    // null-key row never matches in the full-outer join and would be
    // silently classified as an insert (with the OLD image, for
    // old-side rows) — raise in the scan projection instead. The wrap
    // rides the key columns the join itself consumes, so it cannot be
    // pruned away.
    def keyChecked(df: DataFrame, side: String): DataFrame =
      keyCols.foldLeft(df) { (d, k) =>
        d.withColumn(k,
          when(col(k).isNull, raise_error(lit(
            s"SnapshotDiff: null key column '$k' in the $side snapshot " +
              "— keys must be non-null")))
            .otherwise(col(k)))
      }
    val o = keyChecked(oldDf, "old").as("o")
    val n = keyChecked(newDf, "new").as("n")
    val on = keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val inOld = col(s"o.${keyCols.head}").isNotNull
    val inNew = col(s"n.${keyCols.head}").isNotNull
    val sameValues =
      if (valueCols.isEmpty) lit(true)
      else struct(valueCols.map(c => col(s"o.$c")): _*) <=>
        struct(valueCols.map(c => col(s"n.$c")): _*)
    val op = when(!inOld, ChangeModel.Insert)
      .when(!inNew, ChangeModel.Delete)
      .otherwise(ChangeModel.UpdatePost)
    val image = oldDf.columns.toSeq.map { c =>
      when(inNew, col(s"n.$c")).otherwise(col(s"o.$c")).as(c)
    }
    o.join(n, on, "full_outer")
      .filter(!inOld || !inNew || !sameValues)
      .select(image :+ op.as(ChangeModel.OpCol) :+
        lit(seq).as(ChangeModel.SeqCol): _*)
  }
}
