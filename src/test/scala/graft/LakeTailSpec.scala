package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, IcebergLite}

/** Native lakehouse streaming TAILS: version-offset micro-batches over
  * the O(changed-files) CDC diff, checkpointed stop/restart, both
  * table formats — closing "streaming tails need the connector jar".
  */
class LakeTailSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"laketail_$name").toString

  /** Run the tail until idle, sinking batches as (batchId, rows). */
  private def drain(tbl: String, fmt: String, out: String, ckpt: String,
      startingVersion: Option[Long] = None,
      extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft.sources.LakeTailSource")
      .option("path", tbl).option("table_format", fmt)
      .option("keys", "k")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    startingVersion.foreach(v => r = r.option("starting_version", v))
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "tail stream timed out")
  }

  private def sunk(out: String): Set[(Long, String, String, Long)] =
    spark.read.parquet(out)
      .select(col("k"), col("v"), col("_op"), col("_seq"))
      .as[(Long, String, String, Long)].collect().toSet

  test("delta tail: full history from version 0, keyed CDC per version, " +
      "checkpointed restart consumes ONLY new commits") {
    val base = tmp("delta")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    DeltaLite.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
    DeltaLite.upsert(spark, Seq((2L, "B2"), (3L, "c")).toDF("k", "v"),
      tbl, Seq("k"))
    drain(tbl, "delta", out, ckpt, startingVersion = Some(0L))
    val first = sunk(out)
    assert(first == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L), // v0 full image
      (2L, "B2", "update_postimage", 1L), (3L, "c", "insert", 1L)), first.toString)
    // stop happened (AvailableNow); new commits, then RESTART from the
    // checkpointed version offset — only the new versions arrive
    DeltaLite.upsert(spark, Seq((1L, "A9")).toDF("k", "v"), tbl, Seq("k"))
    drain(tbl, "delta", out, ckpt)
    val second = sunk(out)
    assert(second == first + ((1L, "A9", "update_postimage", 2L)), second.toString)
    // idempotent: nothing new → nothing appended
    drain(tbl, "delta", out, ckpt)
    assert(sunk(out) == second)
  }

  test("iceberg tail: sequence-number offsets, upsert deltas arrive as " +
      "keyed updates, restart resumes") {
    val base = tmp("ice")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    IcebergLite.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
    IcebergLite.write(spark, Seq((3L, "c")).toDF("k", "v"), tbl)
    drain(tbl, "iceberg", out, ckpt, startingVersion = Some(1L))
    val first = sunk(out)
    assert(first == Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 2L)),
      first.toString)
    IcebergLite.write(spark, Seq((4L, "d")).toDF("k", "v"), tbl)
    drain(tbl, "iceberg", out, ckpt)
    assert(sunk(out) == first + ((4L, "d", "insert", 3L)))
  }

  test("iceberg tails over ORC and AVRO data-file tables: the " +
      "append-only fast path and the keyed mutation diff both ride " +
      "the format-dispatching scan") {
    for (fmt <- Seq("orc", "avro")) {
      val base = tmp(s"ice_$fmt")
      val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
      IcebergLite.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
        tbl, format = Some(fmt))
      IcebergLite.write(spark, Seq((3L, "c")).toDF("k", "v"), tbl)
      drain(tbl, "iceberg", out, ckpt, startingVersion = Some(1L))
      val first = sunk(out)
      assert(first == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
        (3L, "c", "insert", 2L)), s"[$fmt] $first")
      // a MUTATION commit (merge) drops the append-only fast path into
      // the keyed diff — position deletes against $fmt data files
      IcebergLite.upsert(spark, Seq((2L, "B2")).toDF("k", "v"),
        tbl, Seq("k"))
      drain(tbl, "iceberg", out, ckpt)
      val second = sunk(out)
      assert(second == first + ((2L, "B2", "update_postimage", 3L)),
        s"[$fmt] $second")
    }
  }

  test("tail-only default starts at the CURRENT version; the row cap " +
      "refuses oversized batches loudly") {
    val base = tmp("cap")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    DeltaLite.write(spark, Seq((1L, "old")).toDF("k", "v"), tbl)
    drain(tbl, "delta", out, ckpt) // no starting_version → current
    // the pre-existing row is NOT replayed
    assert(!new java.io.File(out).exists() ||
      spark.read.parquet(out).count() == 0)
    DeltaLite.write(spark, Seq((2L, "new")).toDF("k", "v"), tbl)
    drain(tbl, "delta", out, ckpt)
    assert(sunk(out) == Set((2L, "new", "insert", 1L))) // delta v1
    // cap: a batch larger than max_rows_per_batch raises
    val tbl2 = s"$base/tbl2"
    DeltaLite.write(spark,
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), tbl2)
    val q = spark.readStream.format("graft.sources.LakeTailSource")
      .option("path", tbl2).option("table_format", "delta")
      .option("keys", "k").option("starting_version", 0)
      .option("max_rows_per_batch", 10)
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      { q.awaitTermination(120000); () })
    assert(err.getMessage.contains("max_rows_per_batch") ||
      Option(err.getCause).exists(_.getMessage
        .contains("max_rows_per_batch")), err.getMessage)
    // the cap is enforced from the spill's own written counts and a
    // refused batch deletes its spill dir — NO spill files survive
    val spill2 = new org.apache.hadoop.fs.Path(s"$base/ckpt2",
      "graft-spill")
    val fs2 = spill2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def binFiles(p: org.apache.hadoop.fs.Path): Long =
      if (!fs2.exists(p)) 0L
      else fs2.listStatus(p).map(st =>
        if (st.isDirectory) binFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".bin")) 1L else 0L).sum
    assert(binFiles(spill2) == 0L, s"over-cap batch wrote spill files")
  }

  test("capped spill evaluates the diff lineage ONCE for an in-cap " +
      "batch (no separate guard count), and still refuses over-cap") {
    val base = tmp("onepass")
    val tbl = s"$base/tbl"
    DeltaLite.write(spark,
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"), tbl)
    // count per-partition evaluations of the diff via an accumulator
    // buried in the lineage: one spill pass = each partition computed
    // exactly once
    val evals = spark.sparkContext.longAccumulator("diff-evals")
    def diffDf = {
      import org.apache.spark.sql.functions.udf
      val tick = udf((k: Long) => { evals.add(1L); k })
      DeltaLite.read(spark, tbl)
        .select(tick(col("k")).as("k"), col("v"))
        .withColumn("_op", lit("insert")).withColumn("_seq", lit(1L))
    }
    val parts = graft.sources.LakeTailSource.spill(spark, diffDf,
      new org.apache.hadoop.fs.Path(s"$base/spill1"), maxRows = 100L)
    assert(parts.map(_.asInstanceOf[graft.sources.LakeTailFilePartition]
      .rows).sum == 40L)
    assert(evals.value == 40L,
      s"in-cap batch evaluated the diff ${evals.value}/40 row-passes — " +
        "expected exactly one pass")
    // over-cap refuses AND takes its spill files with it
    evals.reset()
    val err = intercept[IllegalArgumentException] {
      graft.sources.LakeTailSource.spill(spark, diffDf,
        new org.apache.hadoop.fs.Path(s"$base/spill2"), maxRows = 10L)
    }
    assert(err.getMessage.contains("max_rows_per_batch"))
    val fs3 = new org.apache.hadoop.fs.Path(s"$base/spill2")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs3.exists(new org.apache.hadoop.fs.Path(s"$base/spill2")),
      "refused batch left its spill dir behind")
  }

  test("CDF tables tail through EXACT change-data batches: _seq is the " +
      "per-commit version (finer than the keyed diff's batch-end " +
      "stamp) and preimages drop") {
    val base = tmp("cdf")
    val tbl = s"$base/tbl"
    DeltaLite.write(spark, Seq((1L, "a")).toDF("k", "v"), tbl,    // v0
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLite.write(spark, Seq((2L, "b")).toDF("k", "v"), tbl)    // v1
    DeltaLite.upsert(spark, Seq((1L, "A")).toDF("k", "v"), tbl,   // v2
      Seq("k"))
    val c = graft.sources.LakeTailSource.Conf(tbl, "delta", Seq("k"),
      None, None, versionsPerBatch = 2, maxRows = 0L, onMissing = "fail")
    // one batch spanning v1..v2: the CDF path stamps each row with its
    // COMMIT version; the keyed diff would stamp both rows `to`=2
    val got = graft.sources.LakeTailSource.changes(spark, c, 0L, 2L)
      .select("k", "v", "_op", "_seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (2L, "b", "insert", 1L),
      (1L, "A", "update_postimage", 2L)), got.toString)
    // e2e drain: the streamed feed equals the CDF change set (no
    // preimages, per-version sequencing)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    drain(tbl, "delta", out, ckpt, startingVersion = Some(0L))
    assert(sunk(out) == Set(
      (1L, "a", "insert", 0L),
      (2L, "b", "insert", 1L),
      (1L, "A", "update_postimage", 2L)), sunk(out).toString)
  }

  test("batches ship EXECUTOR-side: a batch far beyond the old 100k " +
      "driver-collect cap streams fine, and a multi-partition diff " +
      "plans >1 InputPartition") {
    val base = tmp("big")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val n = 150000L
    DeltaLite.write(spark,
      spark.range(n).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")), tbl)
    drain(tbl, "delta", out, ckpt, startingVersion = Some(0L))
    val got = spark.read.parquet(out)
    assert(got.count() == n)
    assert(got.filter(col("_op") === "insert").count() == n)
    // spot-check values survived the UnsafeRow spill round-trip
    assert(got.filter(col("k") === 149999L).select("v").head().getString(0)
      == "v149999")
    // committed batches clean their spill dirs
    val spillRoot = new org.apache.hadoop.fs.Path(ckpt, "graft-spill")
    val fs = spillRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(spillRoot) || fs.listStatus(spillRoot).isEmpty)
    // the spill itself plans one InputPartition per non-empty diff
    // partition — executor read parallelism, the driver sees only paths
    val df = DeltaLite.read(spark, tbl)
      .withColumn("_op", lit("insert")).withColumn("_seq", lit(0L))
      .repartition(4)
    val parts = graft.sources.LakeTailSource.spill(spark, df,
      new org.apache.hadoop.fs.Path(s"$base/spill"), 0L)
    assert(parts.length > 1, s"expected multi-partition plan, got ${parts.length}")
    val rf = new graft.sources.LakeTailReaderFactory
    val readBack = parts.map { p =>
      val r = rf.createReader(p)
      var c = 0L
      while (r.next()) { assert(r.get().numFields == 4); c += 1 }
      r.close(); c
    }.sum
    assert(readBack == n)
  }

  test("starting_timestamp resolves the initial offset by time travel: " +
      "the tail emits only changes AFTER the state at that instant") {
    val base = tmp("ts")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    DeltaLite.write(spark, Seq((1L, "a")).toDF("k", "v"), tbl)   // v0
    DeltaLite.write(spark, Seq((2L, "b")).toDF("k", "v"), tbl)   // v1
    DeltaLite.write(spark, Seq((3L, "c")).toDF("k", "v"), tbl)   // v2
    // the deterministic writer stamps commitInfo timestamp 1 everywhere;
    // restamp 100/200/300 like a foreign log with real clocks
    val fs0 = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 to 2).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(tbl, f"_delta_log/$v%020d.json")
      val in = fs0.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val o = fs0.create(p, true)
      try o.write(txt.replaceFirst("\"timestamp\":1\\b",
        s""""timestamp":${100 * (v + 1)}""").getBytes("UTF-8"))
      finally o.close()
    }
    drain(tbl, "delta", out, ckpt,
      extra = Map("starting_timestamp" -> "250"))
    // state at ts=250 is v1 → only v2's change arrives
    assert(sunk(out) == Set((3L, "c", "insert", 2L)), sunk(out).toString)
    // mutually exclusive with starting_version
    val err = intercept[Exception] {
      spark.readStream.format("graft.sources.LakeTailSource")
        .option("path", tbl).option("table_format", "delta")
        .option("keys", "k").option("starting_version", 0)
        .option("starting_timestamp", 250)
        .load()
    }
    assert(err.getMessage.contains("mutually exclusive"), err.getMessage)
  }

  test("delta tail after checkpoint+cleanupLogs: the stranded offset " +
      "re-snapshots under on_missing_offset=earliest") {
    val base = tmp("dclean")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    DeltaLite.write(spark, Seq((1L, "a")).toDF("k", "v"), tbl)   // v0
    drain(tbl, "delta", out, ckpt, startingVersion = Some(0L))
    assert(sunk(out).map(_._1) == Set(1L))
    DeltaLite.write(spark, Seq((2L, "b")).toDF("k", "v"), tbl)   // v1
    DeltaLite.write(spark, Seq((3L, "c")).toDF("k", "v"), tbl)   // v2
    DeltaLite.checkpoint(spark, tbl)
    assert(DeltaLite.cleanupLogs(spark, tbl) == 3)
    // the checkpointed tail offset (v0) no longer replays; earliest
    // re-snapshots the CURRENT state as one insert batch
    drain(tbl, "delta", out, ckpt,
      extra = Map("on_missing_offset" -> "earliest"))
    val after = sunk(out)
    val reseq = after.filter(_._4 == 2L)
    assert(reseq.map(r => (r._1, r._3)) ==
      Set((1L, "insert"), (2L, "insert"), (3L, "insert")), after.toString)
  }

  test("expired/cleaned offsets: loud refusal by default, " +
      "on_missing_offset=earliest re-snapshots like Kafka's earliest " +
      "reset") {
    val base = tmp("exp")
    val tbl = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "v"), tbl)
    IcebergLite.write(spark, Seq((2L, "b")).toDF("k", "v"), tbl)
    drain(tbl, "iceberg", out, ckpt, startingVersion = Some(1L))
    assert(sunk(out).map(_._1) == Set(1L, 2L))
    // two more commits, then EXPIRE history so the checkpointed offset
    // (seq 2) vanishes from the metadata
    IcebergLite.write(spark, Seq((3L, "c")).toDF("k", "v"), tbl)
    IcebergLite.write(spark, Seq((4L, "d")).toDF("k", "v"), tbl)
    IcebergLite.expireSnapshots(spark, tbl, keepLast = 1)
    val q = spark.readStream.format("graft.sources.LakeTailSource")
      .option("path", tbl).option("table_format", "iceberg")
      .option("keys", "k").load()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      { q.awaitTermination(120000); () })
    assert(err.getMessage.contains("on_missing_offset") ||
      Option(err.getCause).exists(_.getMessage.contains("on_missing_offset")),
      err.getMessage)
    // with the option: one full re-snapshot batch at the current seq
    drain(tbl, "iceberg", out, ckpt,
      extra = Map("on_missing_offset" -> "earliest"))
    val after = sunk(out)
    val reseq = after.filter(_._4 == 4L) // the re-snapshot batch (seq 4)
    assert(reseq.map(r => (r._1, r._2, r._3)) == Set(
      (1L, "a", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert"), (4L, "d", "insert")), after.toString)
  }
}
