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

  /** Label the streaming query (surfaces in StreamingQueryListener
    * progress and the /metrics endpoint as `query="<name>"`).
    */
  private def named[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T],
      name: Option[String]): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    name.fold(w)(w.queryName)

  /** Append sink: immutable-log files + checkpoint (exactly-once).
    * `format` is any streaming-capable DataSource name — "parquet"
    * default, "delta" once the connector jars are on the classpath
    * (GraftApp probes availability at build time).
    */
  def appendParquet(df: DataFrame, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil, format: String = "parquet",
      options: Map[String, String] = Map.empty,
      queryName: Option[String] = None): StreamingQuery = {
    val w = named(df.writeStream, queryName)
      .format(format)
      .options(options)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Streaming append into a NATIVE Delta table (no delta-spark jar):
    * each micro-batch commits through [[graft.sources.DeltaLite.write]]
    * with Delta's idempotent-writer `txn` action — the appId is stable
    * per sink and the transaction version is the batch id, so a
    * RETRIED batch (foreachBatch redelivery after a crash) is detected
    * against the table's recorded high-water mark and skipped instead
    * of double-appending. Exactly-once append, enforced by the table
    * log itself (the same protocol delta-spark's streaming sink uses).
    */
  def appendDelta(df: DataFrame, tablePath: String, checkpoint: String,
      appId: String, queryName: Option[String] = None,
      /** table properties stamped when the FIRST batch creates the
        * table (delta.enableChangeDataFeed,
        * delta.enableInCommitTimestamps, delta.constraints.*, …). */
      configuration: Map[String, String] = Map.empty): StreamingQuery =
    named(df.writeStream, queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.DeltaLite.write(batch.sparkSession, batch,
          tablePath, "append", txn = Some((appId, batchId)),
          configuration = configuration)
        ()
      }
      .start()

  /** Streaming keyed UPSERT into a NATIVE Delta table: each micro-batch
    * collapses to one FINAL row per key (`ChangeModel.latestRows`, CDC
    * `_op`/`_seq` respected when present) and merges copy-on-write in
    * one atomic Delta commit — terminal images replace/insert, terminal
    * deletes remove the key (MERGE's WHEN MATCHED DELETE), and only the
    * table files holding touched keys are rewritten, located through
    * the per-file stats index. The same `txn` idempotence protocol as
    * [[appendDelta]] makes retried batches exactly-once.
    */
  def upsertDelta(changes: DataFrame, keyCols: Seq[String],
      tablePath: String, checkpoint: String, appId: String,
      queryName: Option[String] = None): StreamingQuery =
    named(changes.writeStream, queryName)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, lit,
          monotonically_increasing_id}
        val Op = graft.cdc.ChangeModel.OpCol
        val asChanges =
          if (batch0.columns.contains(Op)) batch0
          else batch0
            .withColumn(Op, lit(graft.cdc.ChangeModel.Insert))
            .withColumn(graft.cdc.ChangeModel.SeqCol,
              monotonically_increasing_id())
        val latest = graft.cdc.ChangeModel.latestRows(asChanges, keyCols)
          .localCheckpoint() // one row per key, reused for both splits
        val images = latest
          .filter(col(Op) === graft.cdc.ChangeModel.Insert)
          .drop(Op, graft.cdc.ChangeModel.SeqCol)
        val dels = latest
          .filter(col(Op) === graft.cdc.ChangeModel.Delete)
          .select(keyCols.map(col): _*)
        // an empty first micro-batch must not try to create the table
        if (!latest.isEmpty)
          graft.sources.DeltaLite.upsert(batch0.sparkSession, images,
            tablePath, keyCols, txn = Some((appId, batchId)),
            deleteKeys = Some(dels))
        ()
      }
      .start()

  /** Streaming append into a NATIVE Iceberg table — [[appendDelta]]'s
    * twin: each micro-batch commits one snapshot whose summary carries
    * the `graft-txn-app`/`graft-txn-version` watermark, so a RETRIED
    * batch is detected against the table's own metadata and skipped.
    * Exactly-once append enforced by the table, not the checkpoint.
    */
  def appendIceberg(df: DataFrame, tablePath: String, checkpoint: String,
      appId: String, queryName: Option[String] = None): StreamingQuery =
    named(df.writeStream, queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.IcebergLite.write(batch.sparkSession, batch,
          tablePath, "append", txn = Some((appId, batchId)))
        ()
      }
      .start()

  /** Streaming keyed UPSERT into a NATIVE Iceberg table — the
    * merge-on-read twin of [[upsertDelta]]: per micro-batch, one final
    * row per key; terminal images replace/insert, terminal deletes
    * remove, all in ONE snapshot whose position-delete manifest
    * suppresses the touched keys (no data file rewritten, candidate
    * files pruned by manifest column bounds). Same summary-watermark
    * idempotence as [[appendIceberg]].
    */
  def upsertIceberg(changes: DataFrame, keyCols: Seq[String],
      tablePath: String, checkpoint: String, appId: String,
      queryName: Option[String] = None): StreamingQuery =
    named(changes.writeStream, queryName)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, lit,
          monotonically_increasing_id}
        val Op = graft.cdc.ChangeModel.OpCol
        val asChanges =
          if (batch0.columns.contains(Op)) batch0
          else batch0
            .withColumn(Op, lit(graft.cdc.ChangeModel.Insert))
            .withColumn(graft.cdc.ChangeModel.SeqCol,
              monotonically_increasing_id())
        val latest = graft.cdc.ChangeModel.latestRows(asChanges, keyCols)
          .localCheckpoint()
        val images = latest
          .filter(col(Op) === graft.cdc.ChangeModel.Insert)
          .drop(Op, graft.cdc.ChangeModel.SeqCol)
        val dels = latest
          .filter(col(Op) === graft.cdc.ChangeModel.Delete)
          .select(keyCols.map(col): _*)
        if (!latest.isEmpty) {
          val spark = batch0.sparkSession
          val metaDir = new org.apache.hadoop.fs.Path(tablePath, "metadata")
          if (!metaDir.getFileSystem(
              spark.sparkContext.hadoopConfiguration).exists(metaDir))
            graft.sources.IcebergLite.write(spark, images, tablePath,
              txn = Some((appId, batchId)))
          else graft.sources.IcebergLite.upsert(spark, images, tablePath,
            keyCols, deleteKeys = Some(dels), txn = Some((appId, batchId)))
        }
        ()
      }
      .start()

  /** Keyed upsert sink: every microbatch merges the batch's changes
    * into a keyed parquet snapshot via latest-by-key reduction — the
    * PrimaryKeyLookupRecordWriter semantics (record_store.rs:48-87).
    *
    * ONE implementation: this is [[upsertParquetBucketed]] with a
    * single bucket — whole-snapshot rewrite per microbatch, the right
    * shape only while total state is small. Once state outgrows one
    * task's comfortable rewrite, call the bucketed variant directly
    * (or set `buckets:` in config) — same layout family, same
    * crash-safety dance, O(touched buckets) per batch instead of
    * O(total state).
    *
    * Implementation note: without a transactional table format the
    * merge is read-union-rewrite of the touched buckets; on a real
    * deployment swap the body for Delta `MERGE INTO` / JDBC upsert
    * keyed on the schema PK. State per key stays bounded: one row.
    */
  def upsertParquet(changes: DataFrame, keyCols: Seq[String], statePath: String,
      checkpoint: String, queryName: Option[String] = None): StreamingQuery =
    upsertParquetBucketed(changes, keyCols, statePath, checkpoint,
      numBuckets = 1, queryName = queryName)

  /** Scale path of [[upsertParquet]]: the snapshot is hash-bucketed by
    * key into `numBuckets` partition directories (`_bucket=<i>/`), and
    * each microbatch reads+rewrites ONLY the buckets its keys touch —
    * O(batch ∕ bucket-spread × bucket size) per batch instead of
    * O(total state). Pick `numBuckets` so one bucket (state ∕
    * numBuckets) is a comfortable task read — e.g. 4096 buckets for a
    * TB-scale keyset.
    *
    * Crash safety: per-bucket demote-promote swap (same dance as
    * [[upsertParquet]]) against a sibling `<statePath>_bak` root; a
    * crash mid-batch leaves every bucket readable from either live or
    * backup, and the foreachBatch retry re-merges idempotently
    * (latest-by-key is stable under re-application). Untouched bucket
    * directories are never opened, let alone rewritten.
    *
    * Readers: `spark.read.parquet(statePath)` — the `_bucket` column
    * materializes from partition discovery; drop it (or feed it back
    * as a co-location hint for key-equi-joins against the snapshot).
    */
  def upsertParquetBucketed(changes: DataFrame, keyCols: Seq[String],
      statePath: String, checkpoint: String, numBuckets: Int = 64,
      queryName: Option[String] = None): StreamingQuery =
    named(changes.writeStream, queryName)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        import org.apache.hadoop.fs.Path
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
        val spark = batch0.sparkSession
        // Non-CDC update-mode streams (stateful operators emitting
        // refreshed per-key images, e.g. the funnel/histogram twins)
        // carry no _op/_seq: treat each row as an upsert image with the
        // batch id as its sequence, so later batches override earlier
        // snapshots — exactly update-output semantics. CDC-shaped input
        // (both columns present) keeps its own ordering.
        val hasOp = batch0.columns.contains(graft.cdc.ChangeModel.OpCol)
        val hasSeq = batch0.columns.contains(graft.cdc.ChangeModel.SeqCol)
        require(hasOp == hasSeq,
          s"sink input has ${if (hasOp) "_op" else "_seq"} without its " +
            "partner column; provide both (CDC shape) or neither " +
            "(plain upsert images)")
        val batch =
          if (hasOp) batch0
          else batch0
            .withColumn(graft.cdc.ChangeModel.OpCol,
              lit(graft.cdc.ChangeModel.Insert))
            .withColumn(graft.cdc.ChangeModel.SeqCol, lit(batchId))
        val bucketOf = pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets))
          .cast("int")
        // persist: the batch feeds two actions (touched-bucket probe +
        // merge write); without it the source side is recomputed twice
        val withB = batch.withColumn("_bucket", bucketOf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        val touched = withB.select("_bucket").distinct()
          .collect().map(_.getInt(0)).sorted // ≤ numBuckets values
        if (touched.nonEmpty) {
          // resolve the filesystem FROM the state path (s3a://, hdfs://,
          // file:// all differ from fs.defaultFS in general)
          val fs = new Path(statePath).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          // Guard against a pre-bucketed (flat) snapshot at this path:
          // the bucket merge only reads `_bucket=<i>/` dirs, so flat
          // parquet here would be silently IGNORED and the keyset
          // rebuilt from one microbatch — fail loudly instead (migrate
          // by rewriting the old snapshot through a one-off batch
          // upsert into a fresh path).
          if (fs.exists(new Path(statePath))) {
            val flat = fs.listStatus(new Path(statePath)).filter { st =>
              val n = st.getPath.getName
              !n.startsWith("_bucket=") && !n.startsWith("_") &&
                !n.startsWith(".")
            }
            require(flat.isEmpty,
              s"unbucketed snapshot content at $statePath " +
                s"(e.g. ${flat.head.getPath.getName}); bucketed upsert " +
                "would ignore it — migrate the snapshot first")
          }
          val bakRoot = new Path(statePath + "_bak")
          def liveDir(b: Int) = new Path(statePath, s"_bucket=$b")
          def bakDir(b: Int) = new Path(bakRoot, s"_bucket=$b")
          // last committed copy per touched bucket (live wins; backup
          // covers the demote..promote crash window)
          val existingDirs = touched.flatMap { b =>
            if (fs.exists(liveDir(b))) Some(liveDir(b).toString)
            else if (fs.exists(bakDir(b))) Some(bakDir(b).toString)
            else None
          }
          val existing =
            if (existingDirs.isEmpty) None
            // leaf-dir read skips partition discovery; _bucket is
            // recomputed from the keys (same hash), not the dir name
            else Some(spark.read.parquet(existingDirs.toIndexedSeq: _*)
              .withColumn("_bucket", bucketOf))
          val merged = graft.cdc.ChangeModel.latestImages(
            existing match {
              case Some(e) => e.unionByName(withB, allowMissingColumns = true)
              case None    => withB
            }, keyCols)
          val tmp = statePath + "_tmp"
          merged
            // co-locate each bucket into one task → one file per bucket
            .repartition(math.max(touched.length, 1), col("_bucket"))
            .write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
          fs.mkdirs(new Path(statePath))
          def renameOrFail(from: Path, to: Path): Unit =
            require(fs.rename(from, to), s"rename $from -> $to failed")
          touched.foreach { b =>
            val src = new Path(tmp, s"_bucket=$b")
            val dst = liveDir(b); val bak = bakDir(b)
            fs.mkdirs(bakRoot)
            if (fs.exists(dst)) {
              fs.delete(bak, true)
              renameOrFail(dst, bak)
            }
            // src may not exist when every key in the bucket was
            // deleted — the bucket's new state is empty
            if (fs.exists(src)) renameOrFail(src, dst)
            fs.delete(bak, true)
          }
          fs.delete(new Path(tmp), true)
        }
        } finally { withB.unpersist(); () }
        ()
      }
      .start()

  /** Keyed JDBC upsert sink — the portable equivalent of the
    * reference's ClickHouse sink (dozer-sink-clickhouse/src/sink.rs:
    * 262-288 batches rows per epoch and flushes them keyed on the PK;
    * ddl.rs:44 creates the target). Per microbatch:
    *
    *   1. reduce the batch to its latest image per key (keeping
    *      deletes),
    *   2. bulk-load it into `<table>_staging` through Spark's JDBC
    *      writer (parallel, one transaction per partition),
    *   3. one driver-side transaction merges staging into the target:
    *      `DELETE ... WHERE EXISTS (staging match)` then
    *      `INSERT ... SELECT surviving images` — ANSI-portable
    *      (Postgres/MySQL/Derby; swap for MERGE on engines where it's
    *      cheaper), exactly the delete+reinsert a ReplacingMergeTree
    *      collapse performs.
    *
    * Exactly-once: the merge transaction is idempotent (re-applying
    * the same staging content reproduces the same target rows), so a
    * foreachBatch retry after a crash converges; the checkpoint is the
    * resume token (OpIdentifier analogue).
    *
    * The target table is created on first use from the staging
    * table's layout. Column names must be JDBC-identifier-safe.
    */
  def upsertJdbc(changes: DataFrame, keyCols: Seq[String], url: String,
      table: String, checkpoint: String,
      connectionProperties: java.util.Properties = new java.util.Properties)
      : StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col, row_number}
        import org.apache.spark.sql.expressions.Window
        val Op = graft.cdc.ChangeModel.OpCol
        val Seqc = graft.cdc.ChangeModel.SeqCol
        val staging = table + "_staging"
        // latest change per key, deletes preserved (unlike
        // latestImages, which drops them — the sink must act on them)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(Seqc).desc,
            org.apache.spark.sql.functions.when(
              col(Op) === graft.cdc.ChangeModel.UpdatePre, 1).otherwise(2).desc)
        val latest = batch
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        latest.write.mode("overwrite")
          .jdbc(url, staging, connectionProperties)
        // create the target on first use through Spark's own JDBC
        // writer (SaveMode.Ignore: create-if-missing, no-op otherwise)
        // — the dialect supplies portable DDL, where a hand-written
        // CREATE TABLE ... AS would not survive MySQL
        latest.drop(graft.cdc.ChangeModel.OpCol,
            graft.cdc.ChangeModel.SeqCol)
          .limit(0).write.mode("ignore")
          .jdbc(url, table, connectionProperties)
        // Spark's JDBC writer creates columns dialect-quoted
        // (case-preserved); the merge SQL must quote identically or
        // case-normalizing engines (Derby, Postgres) won't resolve them
        val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
        def q(id: String) = dialect.quoteIdentifier(id)
        val payloadCols = latest.columns.filterNot(c => c == Op || c == Seqc)
        val colList = payloadCols.map(q).mkString(", ")
        val keyMatch = keyCols
          .map(k => s"$table.${q(k)} = s.${q(k)}").mkString(" AND ")
        val conn = java.sql.DriverManager.getConnection(url,
          connectionProperties)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try {
            st.executeUpdate(
              s"DELETE FROM $table WHERE EXISTS " +
                s"(SELECT 1 FROM $staging s WHERE $keyMatch)")
            // CAST: dialects that map StringType to CLOB (Derby) don't
            // support <> directly on the column
            st.executeUpdate(
              s"INSERT INTO $table ($colList) SELECT $colList " +
                s"FROM $staging WHERE CAST(${q(Op)} AS VARCHAR(32)) <> " +
                s"'${graft.cdc.ChangeModel.Delete}'")
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally st.close()
        } finally conn.close()
        ()
      }
      .start()

  /** Config-level JDBC upsert for PLAIN rows (no CDC metadata): stage
    * the batch, then transactionally delete target rows whose key
    * appears in the stage and insert the stage. This is the merge
    * contract `dozer run` configs surface for the ClickHouse/Oracle
    * sinks (reference dozer-sink-clickhouse/src/sink.rs:262-288 maps
    * deltas onto versioned inserts; with plain INTO output rows the
    * merge IS delete+insert). Same staging/quoting machinery as
    * [[upsertJdbc]], minus the delta classification.
    *
    * Scale note: the stage write is distributed (Spark JDBC writer);
    * only the two merge statements run on the target engine, which is
    * where a warehouse wants them — no row ever moves through the
    * driver.
    */
  def upsertJdbcRowsBatch(rows: DataFrame, keyCols: Seq[String], url: String,
      table: String,
      connectionProperties: java.util.Properties = new java.util.Properties)
      : Unit = {
    require(keyCols.nonEmpty, "upsertJdbcRowsBatch needs key columns")
    val staging = table + "_staging"
    // string KEY columns must be declared as a comparable SQL type —
    // Spark's default string mapping is CLOB/TEXT on several dialects
    // (Derby among them) and CLOBs can't sit in an equality predicate.
    // Merge keys are short by contract; payload strings keep the default.
    val keyTypes = rows.schema.fields
      .filter(f => keyCols.contains(f.name) &&
        f.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(512)")
    def writer(df: DataFrame) = {
      val w = df.write
      if (keyTypes.nonEmpty)
        w.option("createTableColumnTypes", keyTypes.mkString(", ")) else w
    }
    writer(rows).mode("overwrite").jdbc(url, staging, connectionProperties)
    writer(rows.limit(0)).mode("ignore").jdbc(url, table, connectionProperties)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    def q(id: String) = dialect.quoteIdentifier(id)
    val colList = rows.columns.map(q).mkString(", ")
    val keyMatch = keyCols
      .map(k => s"$table.${q(k)} = s.${q(k)}").mkString(" AND ")
    val conn = java.sql.DriverManager.getConnection(url, connectionProperties)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(
          s"DELETE FROM $table WHERE EXISTS " +
            s"(SELECT 1 FROM $staging s WHERE $keyMatch)")
        st.executeUpdate(
          s"INSERT INTO $table ($colList) SELECT $colList FROM $staging")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Streaming wrapper over [[upsertJdbcRowsBatch]] — checkpointed
    * foreachBatch, exactly-once via the idempotent key merge.
    */
  def upsertJdbcRows(rows: DataFrame, keyCols: Seq[String], url: String,
      table: String, checkpoint: String,
      connectionProperties: java.util.Properties = new java.util.Properties,
      queryName: Option[String] = None)
      : StreamingQuery =
    named(rows.writeStream, queryName)
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertJdbcRowsBatch(batch, keyCols, url, table, connectionProperties)
      }
      .start()
}
