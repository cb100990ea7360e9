package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cdc.KafkaBatch

/** Native Kafka DataSource V2 against the loopback mock broker:
  * metadata-discovered partitions, distributed fetch slices,
  * per-partition Kafka-offset checkpoints, true stop-append-restart
  * resume.
  */
class KafkaNativeSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def batch(base: Long, recs: Seq[(String, String)]) =
    KafkaBatch.Encode.batch(base, 1700000000000L + base,
      recs.map { case (k, v) => (1700000000000L + base, k, v) })

  test("batch read: the full topic snapshot, sliced across readers, " +
      "tombstones preserved") {
    val broker = new TestKafkaBroker("t1")
    broker.append(batch(0L, Seq(("a", "v0"), ("b", "v1"))))
    broker.append(batch(2L, Seq(("c", "v2"))))
    broker.append(batch(3L, Seq(("d", null))))
    try {
      val df = spark.read.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "t1")
        .option("numSlices", "2")
        .load()
      val rows = df.orderBy("offset").collect()
      assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L to 3L))
      assert(rows.map(_.getAs[String]("key")).toSeq == Seq("a", "b", "c", "d"))
      assert(rows.forall(_.getAs[Int]("partition") == 0))
      assert(rows(3).isNullAt(rows(3).fieldIndex("value"))) // tombstone
      assert(df.rdd.getNumPartitions == 2)
    } finally broker.close()
  }

  test("multi-partition topic: partitions discovered from metadata, " +
      "each fetched independently, per-partition offset checkpoints") {
    val broker = new TestKafkaBroker("tm", nPartitions = 3)
    broker.append(0, batch(0L, Seq(("p0a", "x"), ("p0b", "y"))))
    broker.append(1, batch(0L, Seq(("p1a", "z"))))
    // partition 2 stays empty
    val tmp = java.nio.file.Files.createTempDirectory("kafka_native_m").toString
    def startQuery() =
      spark.readStream.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "tm")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    try {
      // batch snapshot across partitions
      val snap = spark.read.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "tm")
        .load().collect()
      assert(snap.map(r => (r.getAs[Int]("partition"),
        r.getAs[Long]("offset"), r.getAs[String]("key"))).sortBy(t => (t._1, t._2))
        .toSeq == Seq((0, 0L, "p0a"), (0, 1L, "p0b"), (1, 0L, "p1a")))

      val q1 = startQuery()
      q1.awaitTermination()
      assert(spark.read.parquet(s"$tmp/out").count() == 3)

      // new data on BOTH partitions while no query runs; restart resumes
      // each partition from its own checkpointed offset
      broker.append(0, batch(2L, Seq(("p0c", "w"))))
      broker.append(1, batch(1L, Seq(("p1b", "v"))))
      val q2 = startQuery()
      q2.awaitTermination()
      val rows = spark.read.parquet(s"$tmp/out")
        .select("partition", "offset", "key").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(rows == Seq(
        (0, 0L, "p0a"), (0, 1L, "p0b"), (0, 2L, "p0c"),
        (1, 0L, "p1a"), (1, 1L, "p1b")))
    } finally broker.close()
  }

  test("streaming: kafka offsets are the checkpoint — stop, append, " +
      "restart resumes exactly, no duplicates") {
    val broker = new TestKafkaBroker("t2")
    broker.append(batch(0L, Seq(("a", "v0"), ("b", "v1"))))
    val tmp = java.nio.file.Files.createTempDirectory("kafka_native").toString
    def startQuery() =
      spark.readStream.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "t2")
        .option("maxOffsetsPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    try {
      val q1 = startQuery()
      q1.awaitTermination()
      assert(spark.read.parquet(s"$tmp/out").count() == 2)

      // new data lands while no query is running
      broker.append(batch(2L, Seq(("c", "v2"), ("d", "v3"), ("e", "v4"))))
      val q2 = startQuery()
      q2.awaitTermination()
      val rows = spark.read.parquet(s"$tmp/out").orderBy("offset").collect()
      // exactly once: offsets 0..4, each exactly one row
      assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L to 4L))
      assert(rows.map(_.getAs[String]("key")).toSeq ==
        Seq("a", "b", "c", "d", "e"))
    } finally broker.close()
  }

  test("admission control caps each micro-batch at maxOffsetsPerTrigger") {
    val broker = new TestKafkaBroker("t3")
    broker.append(batch(0L, (0 until 10).map(i => (s"k$i", s"v$i"))))
    val tmp = java.nio.file.Files.createTempDirectory("kafka_native3").toString
    try {
      val q = spark.readStream.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "t3")
        .option("maxOffsetsPerTrigger", "3")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.read.parquet(s"$tmp/out").count() == 10)
      // 10 offsets at ≤3 per trigger = at least 4 committed batches
      val commits = new java.io.File(s"$tmp/ckpt/commits").list()
        .count(!_.endsWith(".tmp"))
      assert(commits >= 4, s"expected ≥4 micro-batches, got $commits")
    } finally broker.close()
  }

  test("leader routing: a two-broker cluster with split partition " +
      "leadership serves a full snapshot — every fetch goes to the " +
      "partition's leader, never the bootstrap fallback") {
    // partitions 0,2 lead on broker 0; partition 1 leads on broker 1.
    // The mock answers error 6 to any non-leader request, so this test
    // fails loudly if planning ignores the Metadata address book.
    val cluster = new TestKafkaCluster("tlr", nPartitions = 3, nBrokers = 2)
    cluster.append(0, batch(0L, Seq(("p0a", "x"), ("p0b", "y"))))
    cluster.append(1, batch(0L, Seq(("p1a", "z"))))
    cluster.append(2, batch(0L, Seq(("p2a", "w"))))
    try {
      assert(cluster.leaderOf(0) == 0 && cluster.leaderOf(1) == 1 &&
        cluster.leaderOf(2) == 0)
      val rows = spark.read.format("graft.sources.KafkaNativeSource")
        .option("broker", cluster.bootstrap).option("topic", "tlr")
        .load().collect()
        .map(r => (r.getAs[Int]("partition"), r.getAs[Long]("offset"),
          r.getAs[String]("key"))).sortBy(t => (t._1, t._2)).toSeq
      assert(rows == Seq((0, 0L, "p0a"), (0, 1L, "p0b"),
        (1, 0L, "p1a"), (2, 0L, "p2a")))
    } finally cluster.close()
  }

  test("leader routing: leadership moving AFTER planning (error 6 on " +
      "the first fetch) reroutes through a metadata refresh and the " +
      "read completes against the new leader") {
    val cluster = new TestKafkaCluster("tmv", nPartitions = 1, nBrokers = 2)
    cluster.append(0, batch(0L, Seq(("a", "v0"), ("b", "v1"))))
    try {
      // the old leader answers the next fetch with error 6 and flips
      // leadership to broker 1 — exactly a move between plan and read
      cluster.moveLeaderOnNextFetch(0, 1)
      val rows = spark.read.format("graft.sources.KafkaNativeSource")
        .option("broker", cluster.bootstrap).option("topic", "tmv")
        .option("numSlices", "1")
        .load().orderBy("offset").collect()
      assert(rows.map(_.getAs[String]("key")).toSeq == Seq("a", "b"))
      assert(!cluster.movePending, "the move was never triggered — the " +
        "reader did not fetch from the planned leader")
      assert(cluster.leaderOf(0) == 1)
    } finally cluster.close()
  }

  test("a partition appearing mid-stream starts at its EARLIEST " +
      "retained offset (not 0 — which is retention-truncated and " +
      "would fail with OFFSET_OUT_OF_RANGE)") {
    val cluster = new TestKafkaCluster("tgrow", nPartitions = 2)
    cluster.setVisiblePartitions(1)
    cluster.append(0, batch(0L, Seq(("p0a", "x"), ("p0b", "y"))))
    val tmp = java.nio.file.Files.createTempDirectory("kafka_grow").toString
    def startQuery() =
      spark.readStream.format("graft.sources.KafkaNativeSource")
        .option("broker", cluster.bootstrap).option("topic", "tgrow")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    try {
      val q1 = startQuery()
      q1.awaitTermination()
      assert(spark.read.parquet(s"$tmp/out").count() == 2)

      // partition 1 appears, already retention-truncated below offset 2
      cluster.truncateBefore(1, 2L)
      cluster.append(1, batch(2L, Seq(("p1a", "z"), ("p1b", "w"))))
      cluster.setVisiblePartitions(2)
      val q2 = startQuery()
      q2.awaitTermination()
      val rows = spark.read.parquet(s"$tmp/out")
        .select("partition", "offset", "key").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(rows == Seq((0, 0L, "p0a"), (0, 1L, "p0b"),
        (1, 2L, "p1a"), (1, 3L, "p1b")))
    } finally cluster.close()
  }

  test("composes with the CDC decoders: debezium values off the native " +
      "source materialize state") {
    val broker = new TestKafkaBroker("t4")
    def env(id: Int, v: String, op: String) =
      if (op == "d") s"""{"before":{"id":$id,"v":"$v"},"op":"d"}"""
      else s"""{"after":{"id":$id,"v":"$v"},"op":"$op"}"""
    broker.append(batch(0L, Seq(
      ("1", env(1, "x", "r")), ("2", env(2, "y", "r")),
      ("1", env(1, "x", "d")))))
    try {
      val recs = spark.read.format("graft.sources.KafkaNativeSource")
        .option("broker", broker.broker).option("topic", "t4")
        .load()
        .withColumnRenamed("offset", "_seq")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType)))
      val ch = graft.cdc.Debezium.decode(recs, "value", schema,
        seq = Some(col("_seq")))
      val state = graft.cdc.ChangeModel.applyChanges(ch, Seq("id"))
      assert(state.select("id", "v").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "y")))
    } finally broker.close()
  }
}
