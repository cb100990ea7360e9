package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, IcebergLite}

/** WRITER-path scale smoke: the analytic sf1.0 smoke (ScaleUp) covers
  * read/shuffle operators, but the newest code — delta copy-on-write
  * mutations, identity allocation, MERGE rewrite, iceberg partitioned
  * mutations and ORC position scans — runs write→mutate→read rigs
  * whose q-series forms cap their key ranges (oracle determinism), so
  * bench ratios across SFs measure only the input SCAN. This main
  * runs the same writer shapes over the FULL orders table of the
  * given directory, so sf0.1 vs sf1.0 compares 10× actual writer
  * work. Prints ONE JSON line {stage: seconds}.
  *
  * Stages (each timed end-to-end including its commit):
  *  - delta_write:       full orders → new delta table
  *  - delta_cow_delete:  UniForm-enabled CoW delete of ~20% of rows
  *  - delta_merge:       MERGE rewriting ~33% of rows (CoW — UniForm)
  *  - identity_append:   GENERATED ALWAYS id allocation over the batch
  *  - iceberg_part_write: day-transform partitioned iceberg write
  *  - iceberg_merge:     partitioned MERGE (prune → pos-delete → stage)
  *  - iceberg_orc_delete: ORC table deleteWhere (position scan path)
  *
  * Usage: runMain graft.tools.WriterScale <sfDir> [workDir]
  */
object WriterScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WriterScale <sfDir> [workDir]")
    val sfDir = args(0)
    val work = if (args.length > 1) args(1)
      else new java.io.File(sys.props("java.io.tmpdir"),
        "graft_writer_scale").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)

    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fresh(name: String): String = {
      val p = new org.apache.hadoop.fs.Path(work, name)
      fs.delete(p, true)
      p.toString
    }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def stage[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = sec
      System.err.println(f"[writer-scale] $name%-20s $sec%8.3f s")
      r
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").cast("bigint").as("o_orderkey"),
        col("o_custkey").cast("bigint").as("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
    val n = orders.count()
    System.err.println(s"[writer-scale] orders rows: $n")

    // ---- delta: write, UniForm CoW delete, DV merge
    val dt = fresh("delta_uniform")
    stage("delta_write") { DeltaLite.write(spark, orders, dt) }
    DeltaLite.enableColumnMapping(spark, dt)
    DeltaLite.setTableProperties(spark, dt, Map(
      "delta.enableIcebergCompatV2" -> "true"))
    stage("delta_cow_delete") {
      DeltaLite.deleteWhere(spark, dt, col("o_custkey") % 5 === 0)
    }
    val mergeBatch = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
    stage("delta_merge") {
      DeltaLite.upsert(spark, mergeBatch, dt, Seq("o_orderkey"))
    }
    val visible = stage("delta_read") { DeltaLite.read(spark, dt).count() }

    // ---- delta identity allocation over the full batch
    val it = fresh("delta_identity")
    val idMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 1L).build()
    stage("identity_create") {
      DeltaLite.write(spark, orders.limit(1)
        .select(lit(null).cast("long").as("id", idMeta),
          col("o_orderkey")), it)
    }
    stage("identity_append") {
      DeltaLite.write(spark, orders.select(col("o_orderkey")), it)
    }
    val ids = stage("identity_read") {
      DeltaLite.read(spark, it)
        .agg(countDistinct(col("id")), count(lit(1))).head
    }
    require(ids.getLong(0) == ids.getLong(1),
      s"identity ids must be unique: $ids")

    // ---- iceberg: partitioned write, merge, ORC position delete
    val ic = fresh("iceberg_part")
    stage("iceberg_part_write") {
      IcebergLite.write(spark, orders, ic,
        partitionBy = Seq("month(o_orderdate)"))
    }
    stage("iceberg_merge") {
      IcebergLite.upsert(spark,
        orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0),
        ic, Seq("o_orderkey"))
    }
    val io = fresh("iceberg_orc")
    stage("iceberg_orc_write") {
      IcebergLite.write(spark, orders, io, format = Some("orc"))
    }
    stage("iceberg_orc_delete") {
      IcebergLite.deleteWhere(spark, io, col("o_custkey") % 4 === 0)
    }
    val orcRows = stage("iceberg_orc_read") {
      IcebergLite.read(spark, io).count()
    }
    System.err.println(
      s"[writer-scale] delta visible=$visible orc visible=$orcRows")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"writer_scale","rows":$n,"stages":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
