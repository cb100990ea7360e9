package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, ColumnVector,
  DecimalColumnVector, DoubleColumnVector, LongColumnVector,
  TimestampColumnVector}
import org.apache.hadoop.fs.Path
import org.apache.orc.OrcFile
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** ORC scan WITH exact per-file row ordinals, through the orc-core row
  * reader Spark already bundles — the piece Spark's vectorized ORC
  * source is missing (`_metadata.row_index` is parquet-only), and the
  * piece iceberg position deletes need: a delete file's `(file_path,
  * pos)` coordinate is the row's ordinal within its data file, so both
  * APPLYING foreign deletes against ORC data files and STAGING new
  * ones from a mutation require counting rows in file order.
  *
  * Used SURGICALLY: plain scans and equality-delete application ride
  * Spark's vectorized (whole-stage-codegen'd) ORC source with null
  * ordinals; only the files position deletes actually target — or a
  * mutation's pruned candidate files — pay this row-by-row reader.
  * One task per file, `VectorizedRowBatch` iteration executor-side,
  * projection by name (missing columns read null — the same
  * add-column evolution rule as everywhere else).
  *
  * Timestamp note: ORC `timestamp` is wall-clock; values reproduce
  * Spark's own ORC reader under the same session timezone (the
  * single-JVM contract this engine runs with; cross-timezone foreign
  * wall-clock files are the documented iceberg-runtime edge).
  */
object IcebergOrcData {

  /** Distributed scan of ORC files projected BY NAME to `readSchema`,
    * appending `__ice_file` (the file path as given) and `__ice_pos`
    * (EXACT row ordinal). One task per file.
    */
  def scanWithPos(spark: SparkSession, readSchema: StructType,
      paths: Seq[String]): DataFrame = {
    val outSchema = StructType(readSchema.fields ++ Array(
      StructField("__ice_file", StringType, nullable = false),
      StructField("__ice_pos", LongType, nullable = false)))
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fieldNames = readSchema.fields.map(_.name)
    val fieldTypes = readSchema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .mapPartitions { it =>
        it.flatMap { p =>
          val reader = OrcFile.createReader(new Path(p),
            OrcFile.readerOptions(serConf.value))
          val fileSchema = reader.getSchema
          val names = fileSchema.getFieldNames.asScala.toIndexedSeq
          // reader field name -> file column position (-1 = absent)
          val colIdx: Array[Int] = fieldNames.map(names.indexOf)
          val rows = reader.rows()
          // LAZY batch-at-a-time emission: one VectorizedRowBatch in
          // flight per file, never the whole file in memory — a large
          // delete-targeted ORC file streams through in 1024-row
          // windows. The task-completion hook covers early-terminated
          // consumers (limits) that abandon the iterator mid-file.
          var open = true
          def closeAll(): Unit = if (open) {
            open = false; rows.close(); reader.close()
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          new Iterator[Row] {
            private val batch = fileSchema.createRowBatch(1024)
            // Per-column extractors built ONCE per file: ORC's
            // nextBatch refills the SAME ColumnVector objects in
            // place, so the (DataType, ColumnVector) dispatch can
            // bind the typed vector here instead of re-matching per
            // cell (isRepeating/noNulls DO flip batch-to-batch and
            // are read inside the closure).
            private val extractors: Array[Int => Any] =
              Array.tabulate(fieldNames.length) { i =>
                if (colIdx(i) < 0) (_: Int) => null
                else extractor(fieldTypes(i), batch.cols(colIdx(i)),
                  fieldNames(i))
              }
            private var r = 0
            private var ord = 0L
            private def advance(): Unit = {
              while (open && r >= batch.size) {
                if (rows.nextBatch(batch)) r = 0
                else closeAll()
              }
            }
            override def hasNext: Boolean = {
              advance(); open && r < batch.size
            }
            override def next(): Row = {
              if (!hasNext) throw new NoSuchElementException(p)
              val vals = new Array[Any](outSchema.length)
              var i = 0
              while (i < fieldNames.length) {
                vals(i) = extractors(i)(r)
                i += 1
              }
              vals(fieldNames.length) = p
              vals(fieldNames.length + 1) = ord
              r += 1
              ord += 1L
              new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
            }
          }
        }
      }
    spark.createDataFrame(rdd.map(identity), outSchema)
  }

  /** Column → a row-indexed cell reader, the type dispatch done HERE
    * (once per column per file) instead of per cell. The returned
    * closure re-reads `isRepeating`/`noNulls` each call because ORC
    * flips them batch-to-batch on the same vector object.
    */
  private def extractor(dt: DataType, v: ColumnVector,
      name: String): Int => Any = {
    val get: Int => Any = (dt, v) match {
      case (BooleanType, lv: LongColumnVector) =>
        i => lv.vector(i) != 0L
      case (IntegerType, lv: LongColumnVector) =>
        i => lv.vector(i).toInt
      case (LongType, lv: LongColumnVector) =>
        i => lv.vector(i)
      case (DateType, lv: LongColumnVector) =>
        i => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(lv.vector(i)))
      case (FloatType, dv: DoubleColumnVector) =>
        i => dv.vector(i).toFloat
      case (DoubleType, dv: DoubleColumnVector) =>
        i => dv.vector(i)
      case (StringType, bv: BytesColumnVector) =>
        i => new String(bv.vector(i), bv.start(i), bv.length(i), "UTF-8")
      case (BinaryType, bv: BytesColumnVector) =>
        i => java.util.Arrays.copyOfRange(bv.vector(i), bv.start(i),
          bv.start(i) + bv.length(i))
      case (TimestampType, tv: TimestampColumnVector) =>
        i =>
          val ts = new java.sql.Timestamp(tv.time(i))
          ts.setNanos(tv.nanos(i))
          ts
      case (TimestampNTZType, tv: TimestampColumnVector) =>
        i =>
          val ts = new java.sql.Timestamp(tv.time(i))
          ts.setNanos(tv.nanos(i))
          ts.toLocalDateTime
      case (d: DecimalType, dv: DecimalColumnVector) =>
        i => dv.vector(i).getHiveDecimal.bigDecimalValue.setScale(d.scale)
      case _ => throw new IllegalArgumentException(
        s"orc row reader: column '$name' is ${v.getClass.getSimpleName}, " +
          s"cannot read as ${dt.sql}")
    }
    row => {
      val i = if (v.isRepeating) 0 else row
      if (!v.noNulls && v.isNull(i)) null else get(i)
    }
  }
}
