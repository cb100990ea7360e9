package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  * tracks commit size. Batch rows ship via the driver (collect with a
  * LOUD `max_rows_per_batch` cap, default 100k — the MemoryStream
  * shipping model): right for streaming-sized commits; bulk backfills
  * and compaction-sized deltas belong on the batch `changesBetween`
  * API, and the cap makes that boundary explicit instead of OOMing.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.LakeTailSource")
  *     .option("path", tbl).option("table_format", "delta")
  *     .option("keys", "k").load()
  * }}}
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
      startingVersion: Option[Long], versionsPerBatch: Int, maxRows: Int)

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
    Conf(path, fmt, keys,
      Option(o.get("starting_version")).map(_.toLong),
      Option(o.get("versions_per_batch")).map(_.toInt).getOrElse(1),
      Option(o.get("max_rows_per_batch")).map(_.toInt).getOrElse(100000))
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
    * reconcile path).
    */
  private[sources] def changes(spark: SparkSession, c: Conf,
      from: Long, to: Long): DataFrame = {
    import graft.cdc.SnapshotDiff
    if (c.format == "delta") {
      if (from < 0)
        SnapshotDiff.changes(
          emptyLike(spark, DeltaLite.read(spark, c.path, Some(to))),
          DeltaLite.read(spark, c.path, Some(to)), c.keys, seq = to)
      else DeltaLite.changesBetween(spark, c.path, from, to, c.keys,
        seq = to)
    } else {
      val meta = IcebergLite.loadMeta(spark, c.path)
      def snapAt(s: Long): Long = meta.snapshots.find(_.sequenceNumber == s)
        .getOrElse(throw new IllegalArgumentException(
          s"sequence number $s not in ${c.path} metadata (expired? " +
            "restart the tail from a live version)")).snapshotId
      if (from <= 0) {
        val full = IcebergLite.read(spark, c.path, Some(snapAt(to)))
        SnapshotDiff.changes(emptyLike(spark, full), full, c.keys, seq = to)
      } else {
        val (oldSide, newSide) = IcebergLite.changedFileSets(spark, c.path,
          snapAt(from), snapAt(to))
        SnapshotDiff.changes(oldSide, newSide, c.keys, seq = to)
      }
    }
  }

  private def emptyLike(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
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
            // Trigger.AvailableNow pins the stop target at start, then
            // batches advance versions_per_batch at a time until it
            private var availableTarget: Option[Long] = None

            override def prepareForTriggerAvailableNow(): Unit =
              availableTarget =
                Some(LakeTailSource.currentVersion(spark, c))

            override def initialOffset(): Offset =
              LakeVersionOffset(c.startingVersion
                .map(_ - 1) // first batch INCLUDES starting_version
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
              LakeVersionOffset(
                math.min(cur, s + math.max(1, c.versionsPerBatch)))
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
              val rows = df.limit(c.maxRows + 1).collect()
              require(rows.length <= c.maxRows,
                s"lake tail batch (${c.path} versions ($s, $e]) exceeds " +
                  s"max_rows_per_batch=${c.maxRows} — raise the cap, " +
                  "lower versions_per_batch, or run the backfill through " +
                  "the batch changesBetween API")
              Array(LakeTailPartition(rows, tailSchema))
            }

            override def createReaderFactory(): PartitionReaderFactory =
              new LakeTailReaderFactory

            override def commit(end: Offset): Unit = ()
            override def stop(): Unit = ()
          }
      }
    }
}

/** Rows ship embedded in the partition (MemoryStream model; bounded by
  * max_rows_per_batch at plan time).
  */
private[sources] final case class LakeTailPartition(rows: Array[Row],
    schema: StructType) extends InputPartition

private[sources] class LakeTailReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[LakeTailPartition]
      private val ser = ExpressionEncoder(part.schema).createSerializer()
      private var i = -1
      override def next(): Boolean = { i += 1; i < part.rows.length }
      override def get(): InternalRow = ser(part.rows(i)).copy()
      override def close(): Unit = ()
    }
}
