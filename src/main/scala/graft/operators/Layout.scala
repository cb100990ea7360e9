package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) data layout for multi-dimensional data skipping —
  * the write-side optimization that makes 100 TB parquet scans cheap on
  * MORE than one predicate column: interleaving the bits of two or
  * three dimension keys gives a single sort key whose ranges are
  * simultaneously tight in EVERY dimension, so per-file min/max
  * statistics prune scans on any of them (the Delta/Iceberg OPTIMIZE
  * ZORDER capability, built from plain Spark: range-partition + sort on
  * the Morton key).
  *
  * The key function is pure codegen'd bit arithmetic (shift/and/or) —
  * no UDF — and replays exactly in SQL (q117 hash-matches the keys),
  * so layout decisions are auditable cross-engine.
  *
  * Scale shape: `zorderWrite`'s only cost is the one range-partition
  * shuffle any global sort pays; file statistics then shrink scans
  * forever after. Dimensions must be NON-NEGATIVE ints below 2³¹ (2-d)
  * or 2²¹ (3-d) — rank, bucket, epoch-day, scaled value; clamp or hash
  * upstream.
  */
object Layout {

  /** Spread the low 31 bits of x so consecutive bits land 2 apart
    * (…b₂0b₁0b₀) — the classic magic-mask cascade, one codegen'd
    * expression tree.
    */
  private def spread2(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x7FFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Spread the low 21 bits of x 3 apart (for 3-d interleave). */
  private def spread3(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x1FFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 32)).bitwiseAND(lit(0x001F00000000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 16)).bitwiseAND(lit(0x001F0000FF0000FFL))
    val d = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val e = d.bitwiseOR(shiftleft(d, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Morton key of 2 or 3 non-negative dimension columns (cast to
    * long): bit i of dim j lands at position i·n + j. Total order =
    * the Z-curve.
    */
  def mortonKey(dims: Seq[Column]): Column = dims.size match {
    case 2 => spread2(dims(0).cast("long"))
      .bitwiseOR(shiftleft(spread2(dims(1).cast("long")), 1))
    case 3 => spread3(dims(0).cast("long"))
      .bitwiseOR(shiftleft(spread3(dims(1).cast("long")), 1))
      .bitwiseOR(shiftleft(spread3(dims(2).cast("long")), 2))
    case n => throw new IllegalArgumentException(
      s"mortonKey interleaves 2 or 3 dimensions, got $n")
  }

  /** Cluster `df` on the Z-curve of `dims` into `numFiles` range
    * partitions, sorted within each — written as parquet, every file's
    * min/max footer statistics are tight in EVERY dimension, so scans
    * filtered on ANY of them prune files. The key column is dropped
    * before the write (it is derivable, not data).
    */
  def zorderWrite(df: DataFrame, dims: Seq[Column], numFiles: Int,
      path: String): Unit =
    df.withColumn("__z", mortonKey(dims))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** One row per (file, row group, column): the parquet FOOTER min/max
    * statistics a scan planner prunes with — read WITHOUT touching any
    * data page (footers are KB-sized). This is the audit surface for
    * layout decisions: after a [[zorderWrite]], every dimension's
    * per-group ranges should be tight; if they are not, the layout is
    * not buying the skipping it promised. Footer reads fan out over the
    * executors (one task per file batch), so auditing a 100 TB table
    * costs one metadata pass, not a scan. Integer-typed columns
    * (INT32/INT64) report min/max as longs; others are skipped.
    */
  final case class ColumnStats(file: String, rowGroup: Int,
      column: String, numRows: Long, min: Long, max: Long)

  def footerStats(spark: org.apache.spark.sql.SparkSession,
      dir: String, columns: Seq[String]): Dataset[ColumnStats] = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(conf)
    val files = fs.listStatus(fsPath).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(_.toString)
      .sorted
    val wanted = columns.toSet
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    spark.createDataset(files)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), serConf.value)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
              case (block, i) =>
                block.getColumns.asScala.toSeq.flatMap { c =>
                  val name = c.getPath.toDotString
                  val st = c.getStatistics
                  if (!wanted.contains(name) || st == null ||
                      !st.hasNonNullValue) None
                  else st.genericGetMin match {
                    case mn: java.lang.Number =>
                      Some(ColumnStats(p, i, name, block.getRowCount,
                        mn.longValue,
                        st.genericGetMax
                          .asInstanceOf[java.lang.Number].longValue))
                    case _ => None
                  }
                }
            }
          } finally reader.close()
        }
      }
  }

  /** Scan-pruning audit for a long-typed predicate `column BETWEEN lo
    * AND hi`: how many row groups the footer statistics let a scan
    * SKIP. Output: one row — n_groups, n_scanned, n_pruned,
    * pruned_fraction.
    */
  def pruningReport(spark: org.apache.spark.sql.SparkSession,
      dir: String, column: String, lo: Long, hi: Long): DataFrame = {
    val st = footerStats(spark, dir, Seq(column))
    st.toDF()
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("min") <= hi && col("max") >= lo, 1L).otherwise(0L))
          .as("n_scanned"))
      .select(col("n_groups"), col("n_scanned"),
        (col("n_groups") - col("n_scanned")).as("n_pruned"),
        ((col("n_groups") - col("n_scanned")).cast("double") /
          col("n_groups")).as("pruned_fraction"))
  }
}
