package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Sinks (SURVEY §2.2). Dozer's `Sink` trait batches rows and flushes
  * on epoch commit with resume bookkeeping (dozer-core/src/node.rs:
  * 111-147); Spark's exactly-once equivalent is checkpointed
  * `writeStream` — `foreachBatch` is the upsert path (ClickHouse
  * ReplacingMergeTree analogue), append parquet the immutable-log path.
  */
object Sinks {

  /** Append sink: parquet files + checkpoint (exactly-once). */
  def appendParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Keyed upsert sink: every microbatch merges the batch's changes
    * into a keyed parquet snapshot via latest-by-key reduction — the
    * PrimaryKeyLookupRecordWriter semantics (record_store.rs:48-87).
    *
    * Implementation note: without a transactional table format the
    * merge is read-union-rewrite of the snapshot; on a real deployment
    * swap the body for Delta `MERGE INTO` / JDBC upsert keyed on the
    * schema PK. State per key stays bounded: one row.
    */
  def upsertParquet(changes: DataFrame, keyCols: Seq[String], statePath: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val existing = readSnapshot(spark, statePath, batch)
        val merged = graft.cdc.ChangeModel.latestImages(
          existing match {
            case Some(e) => e.unionByName(batch, allowMissingColumns = true)
            case None    => batch
          },
          keyCols)
        // Crash-safe snapshot swap: materialize to tmp, demote the live
        // snapshot to a backup, promote tmp, then drop the backup. At no
        // instant is there zero committed snapshots on disk — a crash at
        // any point leaves either dst or dst_old readable, so a
        // foreachBatch retry resumes from the last committed keyset
        // instead of silently rebuilding from one microbatch.
        val tmp = statePath + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(statePath)
        val bak = new org.apache.hadoop.fs.Path(statePath + "_old")
        def renameOrFail(from: org.apache.hadoop.fs.Path,
            to: org.apache.hadoop.fs.Path): Unit =
          // Hadoop FileSystem.rename reports most failures by returning
          // false; failing loudly makes the micro-batch retry instead of
          // committing the checkpoint over an unapplied batch
          require(fs.rename(from, to), s"rename $from -> $to failed")
        if (fs.exists(dst)) {
          // normal path: demote live snapshot, promote tmp, drop backup.
          // The pre-demote delete only removes a backup that is now
          // redundant (dst exists and is preferred by readSnapshot).
          fs.delete(bak, true)
          renameOrFail(dst, bak)
          renameOrFail(new org.apache.hadoop.fs.Path(tmp), dst)
          fs.delete(bak, true)
        } else {
          // recovery path (crash between demote and promote): bak is the
          // ONLY committed snapshot — it must survive until dst exists
          // again, so promote first, delete the backup after
          renameOrFail(new org.apache.hadoop.fs.Path(tmp), dst)
          fs.delete(bak, true)
        }
        ()
      }
      .start()

  private def readSnapshot(spark: SparkSession, path: String,
      like: DataFrame): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "_old")
    // Prefer the live snapshot; fall back to the backup left by a crash
    // mid-swap (after dst was demoted, before tmp was promoted).
    if (fs.exists(dst)) Some(spark.read.parquet(path))
    else if (fs.exists(bak)) Some(spark.read.parquet(path + "_old"))
    else None
  }
}
