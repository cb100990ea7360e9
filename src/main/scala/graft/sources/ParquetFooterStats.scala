package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** Per-file row counts, column min/max, and null counts read from the
  * parquet FOOTER the staging write already produced — the single-pass
  * alternative to a second distributed stats scan over freshly staged
  * data (the footer is KB-sized; reading it is the same order of
  * metadata IO as writing the manifest/commit entry for the file).
  * Shared by the Iceberg and Delta writers so neither pays a second
  * cluster scan per commit.
  *
  * Conservative by construction: a column whose stats are missing in
  * ANY row group, or whose extremes are NaN, simply reports no bounds
  * (readers treat bound-less files as always-candidates).
  */
object ParquetFooterStats {

  /** One column's footer-derived stats. `bounds` is None when any row
    * group lacked usable statistics; `nullCount` is None when any row
    * group didn't record it.
    */
  final case class ColStats(bounds: Option[(Any, Any)],
      nullCount: Option[Long])

  final case class FileStats(rows: Long, cols: Map[String, ColStats])

  /** [[read]] over many files with a bounded driver-side thread pool —
    * a wide partitioned commit stages hundreds of part files, and
    * serializing hundreds of KB-sized footer round-trips on one thread
    * is pure latency (object stores especially). Results key by the
    * exact Path given.
    */
  def readAll(conf: Configuration, files: Seq[Path], schema: StructType,
      parallelism: Int = 16): Map[Path, FileStats] = {
    if (files.isEmpty) return Map.empty
    if (files.lengthCompare(1) == 0)
      return Map(files.head -> read(conf, files.head, schema))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, files.length))
    try {
      val tasks = new java.util.ArrayList[
        java.util.concurrent.Callable[(Path, FileStats)]](files.length)
      files.foreach { f =>
        tasks.add(() => f -> read(conf, f, schema))
      }
      val out = collection.mutable.Map.empty[Path, FileStats]
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

  /** Read rows + per-top-level-column stats for the Spark-typed columns
    * `schema` declares (only atomic types parquet stats can faithfully
    * round-trip; everything else is skipped).
    */
  def read(conf: Configuration, file: Path,
      schema: StructType): FileStats = {
    val byField = schema.fields.iterator
      .map(f => f.name -> f.dataType).toMap
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // accumulate across row groups; a single unusable row group
      // poisons that column's bounds/nullCount
      val mins = collection.mutable.Map.empty[String, Any]
      val maxs = collection.mutable.Map.empty[String, Any]
      val nulls = collection.mutable.Map.empty[String, Long]
      val noBounds = collection.mutable.Set.empty[String]
      val noNulls = collection.mutable.Set.empty[String]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val pathParts = c.getPath.toArray
          if (pathParts.length == 1) {
            val name = pathParts(0)
            byField.get(name).foreach { dt =>
              val st = c.getStatistics
              if (st == null) { noBounds += name; noNulls += name }
              else {
                if (st.isNumNullsSet)
                  nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
                else noNulls += name
                if (st.hasNonNullValue) {
                  (convert(dt, st.genericGetMin.asInstanceOf[AnyRef]),
                      convert(dt, st.genericGetMax.asInstanceOf[AnyRef])) match {
                    case (Some(mn), Some(mx)) =>
                      mins(name) = mins.get(name)
                        .map(m => if (cmp(dt, mn, m) < 0) mn else m)
                        .getOrElse(mn)
                      maxs(name) = maxs.get(name)
                        .map(m => if (cmp(dt, mx, m) > 0) mx else m)
                        .getOrElse(mx)
                    case _ => noBounds += name
                  }
                } else if (!st.isEmpty && st.isNumNullsSet &&
                    st.getNumNulls == b.getRowCount) {
                  // all-null row group: contributes no extremes, fine
                } else noBounds += name
              }
            }
          }
        }
      }
      val cols = byField.keysIterator.map { name =>
        val bounds =
          if (noBounds(name)) None
          else for { mn <- mins.get(name); mx <- maxs.get(name) }
            yield (mn, mx)
        val nc = if (noNulls(name)) None else nulls.get(name)
          .orElse(if (rows == 0) Some(0L) else None)
        name -> ColStats(bounds, nc)
      }.toMap
      FileStats(rows, cols)
    } finally reader.close()
  }

  /** Parquet footer value → the JVM value Spark's collect() would have
    * produced for the same column (so manifest/commit rendering is
    * byte-identical with the old distributed-scan path). NaN extremes
    * are dropped — parquet stat ordering is undefined for them.
    */
  private def convert(dt: DataType, v: AnyRef): Option[Any] = (dt, v) match {
    case (ByteType, i: java.lang.Integer) => Some(i.byteValue)
    case (ShortType, i: java.lang.Integer) => Some(i.shortValue)
    case (IntegerType, i: java.lang.Integer) => Some(i.intValue)
    case (LongType, l: java.lang.Long) => Some(l.longValue)
    case (FloatType, f: java.lang.Float) =>
      if (f.isNaN) None else Some(f.floatValue)
    case (DoubleType, d: java.lang.Double) =>
      if (d.isNaN) None else Some(d.doubleValue)
    case (DateType, i: java.lang.Integer) =>
      Some(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue)))
    case (StringType, b: Binary) => Some(new String(b.getBytes, UTF_8))
    case (t: DecimalType, i: java.lang.Integer) =>
      Some(java.math.BigDecimal.valueOf(i.longValue, t.scale))
    case (t: DecimalType, l: java.lang.Long) =>
      Some(java.math.BigDecimal.valueOf(l.longValue, t.scale))
    case (t: DecimalType, b: Binary) =>
      Some(new java.math.BigDecimal(
        new java.math.BigInteger(b.getBytes), t.scale))
    case _ => None
  }

  /** Cross-row-group merge order — UTF-8 byte order for strings (the
    * order parquet computed the per-group stats in), natural order for
    * the rest.
    */
  private def cmp(dt: DataType, a: Any, b: Any): Int = (dt, a, b) match {
    case (StringType, x: String, y: String) =>
      val xb = x.getBytes(UTF_8); val yb = y.getBytes(UTF_8)
      val n = math.min(xb.length, yb.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) {
        c = java.lang.Integer.compare(xb(i) & 0xff, yb(i) & 0xff)
        i += 1
      }
      if (c != 0) c else java.lang.Integer.compare(xb.length, yb.length)
    case (_, x: Comparable[_], y) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => 0
  }
}
