package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{ChangeModel, Debezium, RetractableExtremum}
import org.apache.spark.sql.types._

class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("applyChanges replays insert/update/delete to final state") {
    import spark.implicits._
    // (key, payload, _op, _seq) — dozer Operation sequence per key:
    //  k1: Insert(v=10) then Update(10->11)         => final 11
    //  k2: Insert(20) then Delete                   => gone
    //  k3: Insert(30)                               => 30
    val changes = Seq(
      (1L, 10.0, ChangeModel.Insert, 1L),
      (1L, 10.0, ChangeModel.UpdatePre, 2L),
      (1L, 11.0, ChangeModel.UpdatePost, 2L),
      (2L, 20.0, ChangeModel.Insert, 3L),
      (2L, 20.0, ChangeModel.Delete, 4L),
      (3L, 30.0, ChangeModel.Insert, 5L)
    ).toDF("k", "v", ChangeModel.OpCol, ChangeModel.SeqCol)
    val state = ChangeModel.applyChanges(changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(state == Seq((1L, 11.0), (3L, 30.0)))
  }

  test("aggregate retracts deleted rows and drops emptied groups") {
    import spark.implicits._
    val changes = Seq(
      ("a", 5.0, ChangeModel.Insert, 1L),
      ("a", 7.0, ChangeModel.Insert, 2L),
      ("a", 7.0, ChangeModel.Delete, 3L),
      ("b", 9.0, ChangeModel.Insert, 4L),
      ("b", 9.0, ChangeModel.Delete, 5L)
    ).toDF("g", "v", ChangeModel.OpCol, ChangeModel.SeqCol)
    val out = ChangeModel.aggregate(changes, Seq(col("g")), Seq("s" -> col("v")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 5.0, 1L))) // group b fully retracted
  }

  test("retractable min/max re-derive extremum after deletes") {
    import spark.implicits._
    val rows = Seq(
      ("g", 3.0, 1L), ("g", 5.0, 1L), ("g", 8.0, 1L),
      ("g", 3.0, -1L) // delete current min
    ).toDF("g", "v", "w")
    val r = rows.groupBy(col("g")).agg(
      RetractableExtremum.retractMin(col("v"), col("w")).as("mn"),
      RetractableExtremum.retractMax(col("v"), col("w")).as("mx"))
      .collect()(0)
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 8.0)
  }

  private val dbzRowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("Debezium decode: c/u/d/r over wrapped and flat envelopes") {
    import spark.implicits._
    val feed = Seq(
      // snapshot read, flat envelope
      """{"op":"r","after":{"id":1,"name":"one"},"source":{"lsn":10,"ts_ms":1000}}""",
      // create, payload-wrapped
      """{"payload":{"op":"c","after":{"id":2,"name":"two"},"source":{"lsn":20}}}""",
      // update, wrapped — pre+post share the lsn
      """{"payload":{"op":"u","before":{"id":1,"name":"one"},"after":{"id":1,"name":"uno"},"source":{"lsn":30}}}""",
      // delete, flat
      """{"op":"d","before":{"id":2,"name":"two"},"source":{"lsn":40}}""",
      // MySQL-ish: no lsn, binlog pos carries the sequence
      """{"op":"c","after":{"id":3,"name":"three"},"source":{"pos":50,"ts_ms":5000}}""",
      // tombstone and unknown op are dropped
      """{"op":"x","after":{"id":9,"name":"no"},"source":{"lsn":60}}""",
      """not json at all"""
    ).toDF("value")
    val changes = Debezium.decode(feed, "value", dbzRowSchema)
    assert(changes.columns.toSeq ==
      Seq("id", "name", ChangeModel.OpCol, ChangeModel.SeqCol))
    val rows = changes.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(rows == Set(
      (1L, "one", ChangeModel.Insert, 10L),
      (2L, "two", ChangeModel.Insert, 20L),
      (1L, "one", ChangeModel.UpdatePre, 30L),
      (1L, "uno", ChangeModel.UpdatePost, 30L),
      (2L, "two", ChangeModel.Delete, 40L),
      (3L, "three", ChangeModel.Insert, 50L)))
    // applied state: id1 updated to "uno", id2 deleted, id3 inserted
    val state = ChangeModel.applyChanges(changes, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state == Seq((1L, "uno"), (3L, "three")))
  }

  test("Debezium decode: null preimage (no REPLICA IDENTITY FULL) keeps postimage") {
    import spark.implicits._
    val feed = Seq(
      """{"op":"c","after":{"id":1,"name":"a"},"source":{"lsn":1}}""",
      """{"op":"u","after":{"id":1,"name":"b"},"source":{"lsn":2}}"""
    ).toDF("value")
    val changes = Debezium.decode(feed, "value", dbzRowSchema)
    val state = ChangeModel.applyChanges(changes, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state == Seq((1L, "b")))
  }

  test("Debezium decode accepts a binary value column (Kafka shape)") {
    import spark.implicits._
    // the Kafka source emits `value: binary`; decode casts through string
    val feed = Seq(
      """{"op":"c","after":{"id":7,"name":"seven"},"source":{"lsn":1}}"""
        .getBytes("UTF-8")).toDF("value")
    assert(feed.schema("value").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = Debezium.decode(feed, "value", dbzRowSchema).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 7L &&
      rows(0).getString(1) == "seven")
  }

  test("Debezium encode/decode round-trips a change set") {
    import spark.implicits._
    val changes = Seq(
      (1L, "one", ChangeModel.Insert, 1L),
      (1L, "one", ChangeModel.UpdatePre, 2L),
      (1L, "uno", ChangeModel.UpdatePost, 2L),
      (2L, "two", ChangeModel.Insert, 3L),
      (2L, "two", ChangeModel.Delete, 4L)
    ).toDF("id", "name", ChangeModel.OpCol, ChangeModel.SeqCol)
    val encoded = Debezium.encode(changes, Seq("id"))
    val decoded = Debezium.decode(encoded, "value", dbzRowSchema)
    assert(decoded.exceptAll(changes).isEmpty &&
      changes.exceptAll(decoded).isEmpty)
  }

  test("Debezium snapshot-then-stream via file source reaches batch state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dbz").toFile
    val feedDir = new java.io.File(dir, "feed"); feedDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val outDir = new java.io.File(dir, "out").getAbsolutePath
    // file 1: the snapshot phase (SnapshottingStarted..Done — all op:r)
    java.nio.file.Files.write(
      new java.io.File(feedDir, "00_snapshot.json").toPath,
      Seq(
        """{"op":"r","after":{"id":1,"name":"one"},"source":{"lsn":1,"snapshot":"true"}}""",
        """{"op":"r","after":{"id":2,"name":"two"},"source":{"lsn":2,"snapshot":"true"}}"""
      ).mkString("\n").getBytes)
    // file 2: the streaming phase
    java.nio.file.Files.write(
      new java.io.File(feedDir, "01_changes.json").toPath,
      Seq(
        """{"payload":{"op":"u","before":{"id":1,"name":"one"},"after":{"id":1,"name":"uno"},"source":{"lsn":3}}}""",
        """{"payload":{"op":"d","before":{"id":2,"name":"two"},"source":{"lsn":4}}}""",
        """{"payload":{"op":"c","after":{"id":3,"name":"three"},"source":{"lsn":5}}}"""
      ).mkString("\n").getBytes)
    val stream = graft.sources.Sources.debeziumFileStream(
      spark, feedDir.getAbsolutePath, dbzRowSchema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val accumulated = spark.read.schema(
      StructType(dbzRowSchema.fields ++ Seq(
        StructField(ChangeModel.OpCol, StringType),
        StructField(ChangeModel.SeqCol, LongType)))).parquet(outDir)
    val state = ChangeModel.applyChanges(accumulated, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state == Seq((1L, "uno"), (3L, "three")))
  }

  test("EthLogs.decode: typed row, reference id scheme, reorg -> delete op") {
    import spark.implicits._
    import graft.cdc.EthLogs
    val sig = EthLogs.TransferSig
    val from = "0x" + "0" * 24 + "00000000000000000000000000000000000000aa"
    val to = "0x" + "0" * 24 + "00000000000000000000000000000000000000bb"
    val raw = Seq(
      // live Transfer: block 0x10=16, logIndex 0x3 -> id 16*100000+3*2
      s"""{"address":"0xEE00000000000000000000000000000000000001",
         |"topics":["$sig","$from","$to"],
         |"data":"0x${"0" * 62}2a","blockNumber":"0x10",
         |"transactionIndex":"0x1","logIndex":"0x3","removed":false}"""
        .stripMargin.replace("\n", ""),
      // reorg'd log -> delete op
      s"""{"address":"0xee02","topics":["$sig","$from","$to"],
         |"data":"0x01","blockNumber":"0x11","transactionIndex":"0x0",
         |"logIndex":"0x0","removed":true}""".stripMargin.replace("\n", ""),
      // non-Transfer event (2 topics) -> decoded but not a transfer
      s"""{"address":"0xee03","topics":["0xdead","$from"],"data":"0x05",
         |"blockNumber":"0x12","transactionIndex":"0x0","logIndex":"0x1",
         |"removed":false}""".stripMargin.replace("\n", "")
    ).toDF("value")
    val logs = EthLogs.decode(raw, "value")
    val rows = logs.orderBy("block_number").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("id") == 16L * 100000 + 3 * 2)
    assert(rows(0).getAs[String]("address") ==
      "0xee00000000000000000000000000000000000001")
    assert(rows(0).getAs[String]("op") == "c")
    assert(rows(1).getAs[Boolean]("removed") && rows(1).getAs[String]("op") == "d")

    val tr = EthLogs.transfers(logs).orderBy("block_number").collect()
    assert(tr.length == 2, "non-Transfer log must be dropped")
    assert(tr(0).getAs[String]("from_addr") ==
      "0x" + "00000000000000000000000000000000000000aa")
    assert(tr(0).getAs[java.math.BigDecimal]("value").longValueExact == 42L)
    assert(tr(1).getAs[String]("op") == "d")
  }

  test("dead-letter companions catch what decode silently drops") {
    import spark.implicits._
    import graft.cdc.EthLogs
    val rowSchema = StructType(Seq(StructField("id", LongType)))
    val dbzFeed = Seq(
      """{"op":"c","after":{"id":1},"source":{"lsn":1}}""",          // good
      """{"payload":{"op":"d","before":{"id":1},"source":{"lsn":2}}}""", // good
      """not json at all""",                                          // reject
      """{"foo": 1}""",                                               // no op anywhere
      """{"payload":{"before":{"id":9}}}"""                           // wrapped, no op
    ).toDF("value")
    assert(graft.cdc.Debezium.decode(dbzFeed, "value", rowSchema).count() == 2)
    val dbzBad = graft.cdc.Debezium.malformed(dbzFeed, "value")
      .collect().map(_.getString(0)).toSet
    assert(dbzBad == Set("not json at all", """{"foo": 1}""",
      """{"payload":{"before":{"id":9}}}"""))

    val ethFeed = Seq(
      """{"address":"0xa","topics":[],"data":"0x","blockNumber":"0x1","logIndex":"0x0"}""",
      """garbage{""",
      """{"address":"0xb"}""" // pending log: no block/log index
    ).toDF("value")
    assert(EthLogs.decode(ethFeed, "value").filter(col("id").isNotNull).count() == 1)
    val ethBad = EthLogs.malformed(ethFeed, "value")
      .collect().map(_.getString(0)).toSet
    assert(ethBad == Set("garbage{", """{"address":"0xb"}"""))
  }

  test("eth log stream: reorg retraction reaches materialized state") {
    import graft.cdc.EthLogs
    val sig = EthLogs.TransferSig
    val dir = java.nio.file.Files.createTempDirectory("ethstream").toFile
    val feedDir = new java.io.File(dir, "feed"); feedDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val outDir = new java.io.File(dir, "out").getAbsolutePath
    def log(block: Int, idx: Int, removed: Boolean) =
      s"""{"address":"0xee01","topics":["$sig"],"data":"0x01",""" +
        s""""blockNumber":"0x${block.toHexString}","transactionIndex":"0x0",""" +
        s""""logIndex":"0x${idx.toHexString}","removed":$removed}"""
    // batch 1: two live logs; batch 2: one new log + a reorg removal of
    // the second log from batch 1
    java.nio.file.Files.write(
      new java.io.File(feedDir, "00_live.json").toPath,
      Seq(log(16, 0, false), log(16, 1, false)).mkString("\n").getBytes)
    java.nio.file.Files.write(
      new java.io.File(feedDir, "01_reorg.json").toPath,
      Seq(log(17, 0, false), log(16, 1, true)).mkString("\n").getBytes)
    val stream = EthLogs.asChanges(graft.sources.Sources.ethLogFileStream(
      spark, feedDir.getAbsolutePath, maxFilesPerTrigger = 1))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val state = ChangeModel.applyChanges(
      spark.read.parquet(outDir), Seq("id"))
      .orderBy("id").collect().map(_.getAs[Long]("id")).toSeq
    assert(state == Seq(16L * 100000, 17L * 100000),
      "the reorged log must be retracted, the others kept")
  }

  test("EthLogs.decodeTraces: recursive callTracer tree flattens, parents first") {
    import spark.implicits._
    import graft.cdc.EthLogs
    val trace =
      """{"result":{"type":"CALL","from":"0xAA","to":"0xBB","value":"0x0de0b6b3a7640000",
        |"gas":"0x5208","gasUsed":"0x5208","input":"0x","calls":[
        |  {"type":"DELEGATECALL","from":"0xBB","to":"0xCC","gas":"0x100","gasUsed":"0x80",
        |   "calls":[{"type":"STATICCALL","from":"0xCC","to":"0xDD","gas":"0x10","gasUsed":"0x8"}]},
        |  {"type":"CALL","from":"0xBB","to":"0xEE","value":"0x1","gas":"0x200","gasUsed":"0x100"}
        |]}}""".stripMargin.replace("\n", "")
    val rows = EthLogs.decodeTraces(Seq(trace).toDF("value"), "value").collect()
    assert(rows.length == 4, "3 levels flatten to 4 calls")
    assert(rows(0).getAs[String]("type_field") == "CALL")
    assert(rows(0).getAs[Long]("value") == 1000000000000000000L) // 1 ether in wei
    assert(rows(1).getAs[String]("type_field") == "DELEGATECALL" &&
      rows(1).getAs[Long]("value") == 0L) // missing value -> 0, reference U256::zero
    assert(rows(2).getAs[String]("type_field") == "STATICCALL" &&
      rows(2).getAs[String]("from_addr") == "0xcc")
    assert(rows(3).getAs[String]("to_addr") == "0xee")
    // malformed JSON decodes to zero rows, not a crash
    assert(EthLogs.decodeTraces(Seq("{nope").toDF("value"), "value").count() == 0)
  }

  test("EthLogs.hexToDecimal: 256-bit word fits or flags null") {
    import spark.implicits._
    import graft.cdc.EthLogs
    val df = Seq(
      "0x" + "0" * 63 + "1",              // 1
      "0x" + "f" * 64,                    // 2^256-1 > 38 digits -> null
      "0x" + "0" * 32 + "f" * 32,         // 2^128-1 > 38 digits -> null
      "0xzz",                             // malformed -> null
      "0x" + "0" * 41 + "f" * 23          // 2^92-1, 28 digits -> fits
    ).toDF("h").select(EthLogs.hexToDecimal(col("h")).as("v"))
    val vs = df.collect().map(r =>
      Option(r.getAs[java.math.BigDecimal]("v")).map(_.toBigInteger))
    assert(vs(0).contains(java.math.BigInteger.ONE))
    assert(vs(1).isEmpty && vs(2).isEmpty && vs(3).isEmpty)
    assert(vs(4).contains(BigInt("f" * 23, 16).bigInteger))
  }

  test("snapshot diff: classification, silence on identical rows, and " +
      "the round-trip law applyChanges(old ++ diff) == new") {
    import spark.implicits._
    import graft.cdc.{ChangeModel, SnapshotDiff}
    val oldSnap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val newSnap = Seq(
      (1L, "a", 10.0),           // unchanged -> silent
      (2L, "b", 25.0),           // value change -> update_postimage
      (4L, "D", 40.0),           // non-numeric change -> update too
      (5L, "e", 50.0))           // new key -> insert; 3 gone -> delete
      .toDF("k", "name", "v")
    val diff = SnapshotDiff.changes(oldSnap, newSnap, Seq("k"), seq = 2L)
    val ops = diff.select("k", "_op").as[(Long, String)].collect().toMap
    assert(ops == Map(2L -> "update_postimage", 3L -> "delete",
      4L -> "update_postimage", 5L -> "insert"))
    assert(diff.count() == 4) // key 1 emits nothing
    // delete rows carry the OLD image (there is no new one)
    assert(diff.filter($"k" === 3L).select("name").as[String].head() == "c")
    // round-trip law: old as inserts at seq 1 + the diff at seq 2
    // materializes exactly the new snapshot
    val oldAsChanges = oldSnap
      .withColumn("_op", lit(ChangeModel.Insert))
      .withColumn("_seq", lit(1L))
    val rebuilt = ChangeModel.applyChanges(
      oldAsChanges.unionByName(diff), Seq("k"))
    assert(rebuilt.except(newSnap).count() == 0 &&
      newSnap.except(rebuilt).count() == 0)
    // mismatched schemas are loud
    intercept[IllegalArgumentException] {
      SnapshotDiff.changes(oldSnap, newSnap.drop("v"), Seq("k"))
    }
    // the documented keys-must-be-non-null precondition is ENFORCED:
    // a null-key row (either side) raises instead of being silently
    // classified as an insert carrying the old image
    val withNullKey = Seq((Some(1L), "a", 10.0), (None, "x", 99.0))
      .toDF("k", "name", "v")
    def rootMsg(e: Throwable): String = {
      var t = e; val sb = new StringBuilder(t.getMessage)
      while (t.getCause != null) { t = t.getCause; sb.append(t.getMessage) }
      sb.toString
    }
    val eOld = intercept[Exception] {
      SnapshotDiff.changes(withNullKey, newSnap, Seq("k")).collect()
    }
    assert(rootMsg(eOld).contains("null key"), eOld.toString)
    val eNew = intercept[Exception] {
      SnapshotDiff.changes(oldSnap, withNullKey, Seq("k")).collect()
    }
    assert(rootMsg(eNew).contains("null key"), eNew.toString)
  }
}
