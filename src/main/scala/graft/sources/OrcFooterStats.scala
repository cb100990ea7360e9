package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{BooleanColumnStatistics, ColumnStatistics,
  DateColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics,
  OrcFile, StringColumnStatistics, TimestampColumnStatistics}
import org.apache.spark.sql.types._

/** Per-file row counts and column min/max read from the ORC FOOTER a
  * staging write already produced — the ORC twin of
  * [[ParquetFooterStats]] (same `FileStats` shape, same conservative
  * contract: a column whose statistics are unusable simply reports no
  * bounds, and bound-less files never prune). Spark bundles orc-core,
  * so this reads the file tail directly — KB-sized metadata IO, never
  * a second scan of the staged data.
  *
  * ORC string statistics may be TRUNCATED (`getMinimum` returns null
  * and only `getLowerBound`/`getUpperBound` survive) — truncated
  * extremes are dropped rather than mis-stated, matching the
  * conservative contract.
  */
object OrcFooterStats {

  /** [[read]] over many files with the same bounded driver-side pool
    * rationale as [[ParquetFooterStats.readAll]].
    */
  def readAll(conf: Configuration, files: Seq[Path], schema: StructType,
      parallelism: Int = 16): Map[Path, ParquetFooterStats.FileStats] = {
    if (files.isEmpty) return Map.empty
    if (files.lengthCompare(1) == 0)
      return Map(files.head -> read(conf, files.head, schema))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, files.length))
    try {
      val tasks = new java.util.ArrayList[java.util.concurrent.Callable[
        (Path, ParquetFooterStats.FileStats)]](files.length)
      files.foreach(f => tasks.add(() => f -> read(conf, f, schema)))
      val out = collection.mutable.Map
        .empty[Path, ParquetFooterStats.FileStats]
      pool.invokeAll(tasks).forEach { fut =>
        val (p, st) =
          try fut.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
          }
        out(p) = st
      }
      out.toMap
    } finally { pool.shutdown(); () }
  }

  /** Rows + per-top-level-column stats for the Spark-typed columns
    * `schema` declares (atomic types only — same skip rule as the
    * parquet twin).
    */
  def read(conf: Configuration, file: Path,
      schema: StructType): ParquetFooterStats.FileStats = {
    val byField = schema.fields.iterator
      .map(f => f.name -> f.dataType).toMap
    val reader = OrcFile.createReader(file, OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val stats = reader.getStatistics
      val root = reader.getSchema
      val names = root.getFieldNames.asScala.toSeq
      val kids = root.getChildren.asScala.toSeq
      val cols = names.zip(kids).flatMap { case (name, td) =>
        byField.get(name).map { dt =>
          val cs = stats(td.getId)
          val nullCount = Some(rows - cs.getNumberOfValues)
          val bounds: Option[(Any, Any)] =
            if (cs.getNumberOfValues == 0L) None
            else extremes(dt, cs)
          name -> ParquetFooterStats.ColStats(bounds, nullCount)
        }
      }.toMap
      ParquetFooterStats.FileStats(rows, cols)
    } finally reader.close()
  }

  private def extremes(dt: DataType,
      cs: ColumnStatistics): Option[(Any, Any)] = (dt, cs) match {
    case (IntegerType, s: IntegerColumnStatistics) =>
      Some((s.getMinimum.toInt, s.getMaximum.toInt))
    case (LongType, s: IntegerColumnStatistics) =>
      Some((s.getMinimum, s.getMaximum))
    case (FloatType, s: DoubleColumnStatistics)
        if !s.getMinimum.isNaN && !s.getMaximum.isNaN =>
      Some((s.getMinimum.toFloat, s.getMaximum.toFloat))
    case (DoubleType, s: DoubleColumnStatistics)
        if !s.getMinimum.isNaN && !s.getMaximum.isNaN =>
      Some((s.getMinimum, s.getMaximum))
    case (DateType, s: DateColumnStatistics) =>
      Some((java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(s.getMinimumDayOfEpoch)),
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(s.getMaximumDayOfEpoch))))
    case (TimestampType, s: TimestampColumnStatistics)
        if s.getMinimumUTC != null && s.getMaximumUTC != null =>
      Some((s.getMinimumUTC, s.getMaximumUTC))
    case (StringType, s: StringColumnStatistics)
        if s.getMinimum != null && s.getMaximum != null =>
      Some((s.getMinimum, s.getMaximum))
    case (BooleanType, s: BooleanColumnStatistics) =>
      Some((s.getFalseCount == 0L, s.getTrueCount > 0L))
    case _ => None
  }
}
