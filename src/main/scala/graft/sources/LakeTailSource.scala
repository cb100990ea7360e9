package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Native lakehouse TAIL: a Structured Streaming source whose offsets
  * are Delta VERSIONS / Iceberg SEQUENCE NUMBERS and whose micro-
  * batches are the O(changed-files) keyed CDC between two table states
  * ([[DeltaLite.changesBetween]] / [[IcebergLite.changedFileSets]] +
  * [[graft.cdc.SnapshotDiff]]) — the streaming half of the q118/q129
  * re-snapshot contract, without the delta-spark/iceberg runtime jars.
  * Output rows are the ChangeModel feed (table columns + `_op`/`_seq`)
  * every downstream CDC operator consumes.
  *
  * Offsets persist in the streaming checkpoint (a restart resumes from
  * the last COMMITTED version — exactly-once composed with the txn-
  * protocol sinks). Admission control advances at most
  * `versions_per_batch` table commits per micro-batch, so batch size
  * tracks commit size.
  *
  * Batch rows ship EXECUTOR-SIDE: the keyed diff runs as a normal
  * distributed job whose output partitions SPILL to length-prefixed
  * UnsafeRow files under the streaming checkpoint
  * (`<checkpoint>/graft-spill/v<from>_<to>/rows-NNNNN.bin`, one per
  * non-empty diff partition; each task attempt writes an
  * attempt-unique `.tmp` and renames on success, so speculative or
  * zombie duplicate attempts never race the surviving attempt's
  * bytes), and the scan plans one InputPartition per spilled file — the driver moves only (path, rowCount) pairs, so a catch-up
  * over compaction-sized commits costs one extra materialization (the
  * same order as a shuffle), never a driver collect. Committed
  * batches' spill dirs are deleted in `commit()`; a replayed batch
  * (post-restart) re-plans and overwrites its dir.
  * `max_rows_per_batch` is an OPTIONAL loud bound (default unbounded),
  * enforced from the spill's own written counts in the SAME pass — a
  * refused batch deletes its spill dir, so none of its files survive,
  * and an in-cap batch never evaluates the diff twice.
  *
  * An offset that no longer resolves (delta log cleaned past it,
  * iceberg snapshot expired) refuses loudly by default;
  * `.option("on_missing_offset", "earliest")` instead re-snapshots —
  * one full-table batch of inserts at the current version, the same
  * recovery contract as Kafka's earliest-offset reset at retention
  * truncation (keyed downstream consumers are idempotent per key).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.LakeTailSource")
  *     .option("path", tbl).option("table_format", "delta")
  *     .option("keys", "k").load()
  * }}}
  * Start position: `starting_version` (first batch INCLUDES it),
  * `starting_timestamp` (time-travel resolution — the tail emits
  * changes AFTER the table state at that instant), or the current
  * version (tail-only default).
  */
class LakeTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    LakeTailSource.tableSchema(spark, LakeTailSource.conf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LakeTailTable(schema,
      LakeTailSource.conf(new CaseInsensitiveStringMap(properties)))
}

object LakeTailSource {
  final case class Conf(path: String, format: String, keys: Seq[String],
      startingVersion: Option[Long], startingTimestamp: Option[Long],
      versionsPerBatch: Int, maxRows: Long, onMissing: String)

  private[sources] def conf(o: CaseInsensitiveStringMap): Conf = {
    val path = o.get("path")
    require(path != null && path.nonEmpty,
      "lake tail needs .option(\"path\", <table dir>)")
    val fmt = Option(o.get("table_format")).getOrElse("delta")
    require(fmt == "delta" || fmt == "iceberg",
      s"table_format must be delta|iceberg, got '$fmt'")
    val keys = Option(o.get("keys")).map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(keys.nonEmpty,
      "lake tail needs .option(\"keys\", <comma-separated key columns>)" +
        " — the CDC diff is keyed")
    val onMissing = Option(o.get("on_missing_offset")).getOrElse("fail")
    require(onMissing == "fail" || onMissing == "earliest",
      s"on_missing_offset must be fail|earliest, got '$onMissing'")
    val startVersion = Option(o.get("starting_version")).map(_.toLong)
    val startTs = Option(o.get("starting_timestamp")).map(_.toLong)
    require(startVersion.isEmpty || startTs.isEmpty,
      "starting_version and starting_timestamp are mutually exclusive")
    Conf(path, fmt, keys, startVersion, startTs,
      Option(o.get("versions_per_batch")).map(_.toInt).getOrElse(1),
      Option(o.get("max_rows_per_batch")).map(_.toLong).getOrElse(0L),
      onMissing)
  }

  private[sources] def tableSchema(spark: SparkSession,
      c: Conf): StructType = {
    val base =
      if (c.format == "delta") DeltaLite.snapshot(spark, c.path).schema
      else IcebergLite.loadMeta(spark, c.path).schema
    StructType(base.fields.toSeq :+
      StructField(graft.cdc.ChangeModel.OpCol, StringType) :+
      StructField(graft.cdc.ChangeModel.SeqCol, LongType))
  }

  /** Current tail position: delta = latest version, iceberg = last
    * sequence number.
    */
  private[sources] def currentVersion(spark: SparkSession, c: Conf): Long =
    if (c.format == "delta") DeltaLite.snapshot(spark, c.path).version
    else IcebergLite.loadMeta(spark, c.path).lastSequenceNumber

  /** The CDC batch for (from, to]: `from` < 0 (delta) / 0 (iceberg)
    * means "before the first commit" — empty old side, full first
    * read. Schema changes mid-tail raise (the batch API documents the
    * reconcile path). An unresolvable `from` (expired/cleaned) either
    * raises (`on_missing_offset=fail`) or degrades to the full first
    * read at `to` (`earliest`).
    */
  private[graft] def changes(spark: SparkSession, c: Conf,
      from: Long, to: Long): DataFrame = {
    import graft.cdc.SnapshotDiff
    def fullAt(read: => DataFrame): DataFrame = {
      val full = read
      SnapshotDiff.changes(emptyLike(spark, full), full, c.keys, seq = to)
    }
    if (c.format == "delta") {
      // a cleaned-up log may no longer resolve `from` (no checkpoint at
      // or before it / gapped commits behind the current checkpoint) —
      // probed by the LISTING-ONLY check, not a full log replay
      val fromResolves = DeltaLite.isReplayable(spark, c.path, from)
      if (from < 0) fullAt(DeltaLite.read(spark, c.path, Some(to)))
      else if (!fromResolves) {
        require(c.onMissing == "earliest",
          s"delta version $from is no longer replayable at ${c.path} " +
            "(log cleaned up?) — restart the tail from a live version, " +
            "or set on_missing_offset=earliest to re-snapshot")
        fullAt(DeltaLite.read(spark, c.path, Some(to)))
      } else {
        // ONE replay of the batch-end version shared by the CDF probe
        // and the keyed-diff fallback (no extra per-batch replay)
        val snapTo = DeltaLite.snapshot(spark, c.path, Some(to))
        DeltaLite.changeFeedIfAvailable(spark, c.path, from, to,
          Some(snapTo)) match {
        // EXACT CDF batches beat the keyed diff when the table wrote
        // them: O(changed rows) reads of the cdc/added/removed files,
        // no full-outer join over changed file sets. `_change_type`
        // maps onto the ChangeModel op vocabulary verbatim (preimages
        // drop — the diff contract is postimage-only), `_seq` is the
        // exact commit version (finer than the keyed diff's batch-end
        // stamp, so multi-version batches replay in commit order).
        case Some(cdf) =>
          import graft.cdc.ChangeModel
          cdf.filter(org.apache.spark.sql.functions
              .col("_change_type") =!= "update_preimage")
            .withColumnRenamed("_change_type", ChangeModel.OpCol)
            .withColumnRenamed("_commit_version", ChangeModel.SeqCol)
        case None =>
          DeltaLite.changesBetween(spark, c.path, from, to, c.keys,
            seq = to, toSnap = Some(snapTo))
        }
      }
    } else {
      val meta = IcebergLite.loadMeta(spark, c.path)
      def snapAt(s: Long): Option[Long] =
        meta.snapshots.find(_.sequenceNumber == s).map(_.snapshotId)
      val toSnap = snapAt(to).getOrElse(
        throw new IllegalArgumentException(
          s"sequence number $to not in ${c.path} metadata"))
      if (from <= 0) fullAt(IcebergLite.read(spark, c.path, Some(toSnap)))
      else snapAt(from) match {
        case Some(fromSnap) =>
          // append-only ranges (the common streaming-ingest shape) emit
          // the added files as inserts directly — no keyed join
          IcebergLite.appendOnlyAdds(spark, c.path, fromSnap, toSnap) match {
            case Some(adds) =>
              import graft.cdc.ChangeModel
              import org.apache.spark.sql.functions.{col, lit,
                raise_error, when}
              val guarded = c.keys.foldLeft(adds) { (d, k) =>
                d.withColumn(k, when(col(k).isNull, raise_error(lit(
                  s"SnapshotDiff: null key column '$k' in the new " +
                    "snapshot — keys must be non-null")))
                  .otherwise(col(k)))
              }
              guarded
                .withColumn(ChangeModel.OpCol, lit(ChangeModel.Insert))
                .withColumn(ChangeModel.SeqCol, lit(to))
            case None =>
              val (oldSide, newSide) = IcebergLite.changedFileSets(spark,
                c.path, fromSnap, toSnap)
              SnapshotDiff.changes(oldSide, newSide, c.keys, seq = to)
          }
        case None =>
          require(c.onMissing == "earliest",
            s"sequence number $from not in ${c.path} metadata " +
              "(expired?) — restart the tail from a live version, or " +
              "set on_missing_offset=earliest to re-snapshot")
          fullAt(IcebergLite.read(spark, c.path, Some(toSnap)))
      }
    }
  }

  private def emptyLike(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)

  // --------------------------------------------- executor-side shipping

  /** Hadoop Configuration is a Writable — ship it to executors inside
    * the InputPartition (the reader needs the right FileSystem).
    */
  private[sources] def confToBytes(conf: Configuration): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    val dos = new java.io.DataOutputStream(bos)
    conf.write(dos)
    dos.close()
    bos.toByteArray
  }

  private[sources] def bytesToConf(bytes: Array[Byte]): Configuration = {
    val conf = new Configuration(false)
    conf.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    conf
  }

  /** Run `df` DISTRIBUTED and spill each non-empty output partition as
    * one length-prefixed UnsafeRow file under `dir`; return one
    * InputPartition per file. The driver handles only (path, count)
    * pairs. The spill is transient same-JVM-version state (deleted at
    * commit), so the UnsafeRow binary format is a safe wire format.
    *
    * `max_rows_per_batch` (opt-in) is enforced from the spill's OWN
    * per-partition written counts — the diff lineage evaluates exactly
    * ONCE whether the cap is set or not (no separate guard count), and
    * an over-cap batch deletes its spill dir before refusing, so no
    * spill files survive a refused batch.
    * Spill file names carry the task attempt id, so a speculative or
    * zombie duplicate attempt writes its own file instead of racing
    * the surviving attempt's bytes; only the surviving attempt's path
    * reaches the driver, and orphans die with the dir at commit.
    */
  private[graft] def spill(spark: SparkSession, df: DataFrame,
      dir: Path, maxRows: Long): Array[InputPartition] = {
    val schema = df.schema
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(hconf)
    if (fs.exists(dir)) fs.delete(dir, true) // replayed batch: re-plan
    fs.mkdirs(dir)
    val confBytes = confToBytes(hconf)
    val dirStr = dir.toString
    val nFields = schema.length
    val written: Array[(String, Long)] = df.queryExecution.toRdd
      .mapPartitionsWithIndex { (i, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val conf = bytesToConf(confBytes)
          // write attempt-unique, RENAME on success: a speculative or
          // zombie duplicate attempt can never corrupt the bytes behind
          // the (path, count) the driver collected — each attempt owns
          // its tmp file, and only a COMPLETE file reaches the final
          // name (the loser of a rename race just drops its tmp; both
          // attempts computed identical partition bytes)
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val file = new Path(dirStr, f"rows-$i%05d.bin")
          val tmp = new Path(dirStr, f"rows-$i%05d-a$attempt.bin.tmp")
          val tfs = file.getFileSystem(conf)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(tfs.create(tmp, true), 1 << 16))
          val proj = UnsafeProjection.create(schema)
          val buf = new Array[Byte](1 << 16)
          var n = 0L
          try it.foreach { row =>
            val u = proj(row)
            out.writeInt(u.getSizeInBytes)
            u.writeToStream(out, buf)
            n += 1
          } finally out.close()
          if (!tfs.rename(tmp, file)) {
            require(tfs.exists(file),
              s"spill rename failed with no surviving attempt: $file")
            tfs.delete(tmp, false)
            ()
          }
          Iterator.single((file.toString, n))
        }
      }.collect()
    // opt-in loud bound, enforced from the counts the write itself
    // produced (ONE evaluation of the diff lineage); a refused batch
    // takes its spill files with it
    if (maxRows > 0) {
      val total = written.map(_._2).sum
      if (total > maxRows) {
        fs.delete(dir, true)
        throw new IllegalArgumentException(
          s"lake tail batch carries $total rows, over the explicit " +
            s"max_rows_per_batch=$maxRows — raise/unset the cap, lower " +
            "versions_per_batch, or run the backfill through the batch " +
            "changesBetween API")
      }
    }
    written.map { case (p, n) =>
      LakeTailFilePartition(p, n, nFields, confBytes): InputPartition
    }
  }
}

private[sources] final case class LakeVersionOffset(v: Long) extends Offset {
  override def json(): String = s"""{"v":$v}"""
}

private[sources] class LakeTailTable(tailSchema: StructType,
    c: LakeTailSource.Conf) extends Table with SupportsRead {
  override def name(): String = s"laketail(${c.format}:${c.path})"
  override def schema(): StructType = tailSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tailSchema

        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new MicroBatchStream with SupportsAdmissionControl
              with SupportsTriggerAvailableNow {
            private val spark = SparkSession.active
            private val spillRoot =
              new Path(checkpointLocation, "graft-spill")
            private val SpillDirRe = """v(-?\d+)_(-?\d+)""".r
            // Trigger.AvailableNow pins the stop target at start, then
            // batches advance versions_per_batch at a time until it
            private var availableTarget: Option[Long] = None

            override def prepareForTriggerAvailableNow(): Unit =
              availableTarget =
                Some(LakeTailSource.currentVersion(spark, c))

            override def initialOffset(): Offset =
              LakeVersionOffset(c.startingVersion
                .map(_ - 1) // first batch INCLUDES starting_version
                .orElse(c.startingTimestamp.map { ts =>
                  // the tail emits changes AFTER the state at `ts`
                  // (time-travel resolution per format; loud before
                  // the first commit, like Kafka's timestamp lookup)
                  if (c.format == "delta")
                    DeltaLite.versionAtTimestamp(spark, c.path, ts)
                  else {
                    val snapId = IcebergLite
                      .snapshotAtTimestamp(spark, c.path, ts)
                    IcebergLite.loadMeta(spark, c.path).snapshots
                      .find(_.snapshotId == snapId).get.sequenceNumber
                  }
                })
                .getOrElse(
                  LakeTailSource.currentVersion(spark, c))) // tail-only

            override def latestOffset(): Offset =
              throw new UnsupportedOperationException(
                "latestOffset(start, limit) is used")

            override def latestOffset(start: Offset,
                limit: ReadLimit): Offset = {
              val s = start.asInstanceOf[LakeVersionOffset].v
              val cur = availableTarget.getOrElse(
                LakeTailSource.currentVersion(spark, c))
              val step = math.max(1, c.versionsPerBatch)
              if (c.format == "iceberg") {
                // iceberg sequence numbers can be SPARSE after snapshot
                // expiration — the batch end must be a LIVE snapshot's
                // seq, advancing at most versions_per_batch live commits
                val live = IcebergLite.loadMeta(spark, c.path).snapshots
                  .map(_.sequenceNumber).filter(v => v > s && v <= cur)
                  .sorted
                if (live.isEmpty) LakeVersionOffset(s)
                else LakeVersionOffset(live.take(step).last)
              } else {
                val target = math.min(cur, s + step)
                if (target <= s) LakeVersionOffset(s)
                else {
                  // delta log cleanup may have removed the versions
                  // just past s — the batch END must be replayable, so
                  // a stranded target jumps to the CURRENT version
                  // (one catch-up batch; `changes` then applies the
                  // on_missing_offset policy for the stranded start).
                  // Listing-only probe — no per-batch log replay.
                  val replayable =
                    DeltaLite.isReplayable(spark, c.path, target)
                  LakeVersionOffset(if (replayable) target else cur)
                }
              }
            }

            override def deserializeOffset(json: String): Offset = {
              val node = new com.fasterxml.jackson.databind.ObjectMapper()
                .readTree(json)
              LakeVersionOffset(node.get("v").asLong)
            }

            override def planInputPartitions(start: Offset,
                end: Offset): Array[InputPartition] = {
              val s = start.asInstanceOf[LakeVersionOffset].v
              val e = end.asInstanceOf[LakeVersionOffset].v
              if (e <= s) return Array.empty
              val df = LakeTailSource.changes(spark, c, s, e)
                .select(tailSchema.fieldNames.map(
                  org.apache.spark.sql.functions.col).toIndexedSeq: _*)
              LakeTailSource.spill(spark, df,
                new Path(spillRoot, s"v${s}_$e"), c.maxRows)
            }

            override def createReaderFactory(): PartitionReaderFactory =
              new LakeTailReaderFactory

            /** Batches at or before the committed offset are done —
              * their spill dirs will never be re-read.
              */
            override def commit(end: Offset): Unit = {
              val v = end.asInstanceOf[LakeVersionOffset].v
              val fs = spillRoot.getFileSystem(
                spark.sparkContext.hadoopConfiguration)
              if (fs.exists(spillRoot))
                fs.listStatus(spillRoot).foreach { st =>
                  st.getPath.getName match {
                    case SpillDirRe(_, e2) if e2.toLong <= v =>
                      fs.delete(st.getPath, true); ()
                    case _ => ()
                  }
                }
            }
            override def stop(): Unit = ()
          }
      }
    }
}

/** One spilled diff partition: a length-prefixed UnsafeRow file read
  * ON THE EXECUTOR (the driver never touches row bytes).
  */
private[graft] final case class LakeTailFilePartition(path: String,
    rows: Long, numFields: Int, confBytes: Array[Byte])
  extends InputPartition

private[graft] class LakeTailReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[LakeTailFilePartition]
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(
          new Path(part.path).getFileSystem(
            LakeTailSource.bytesToConf(part.confBytes))
            .open(new Path(part.path)), 1 << 16))
      private var read = 0L
      private var cur: UnsafeRow = _
      override def next(): Boolean =
        if (read >= part.rows) { false }
        else {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val r = new UnsafeRow(part.numFields)
          r.pointTo(bytes, len)
          cur = r
          read += 1
          true
        }
      override def get(): InternalRow = cur
      override def close(): Unit = in.close()
    }
}
