package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._
import graft.cdc.{ChangeModel, Debezium, EthLogs, RetractableExtremum}

/** CDC semantics (SURVEY §2.3 + §6 step 6): the events table replayed as
  * a change stream — `error` events act as deletes, everything else as
  * upserts, `event_id` as the per-key sequence (dozer OpIdentifier).
  * Oracles state the same semantics in plain SQL over the raw log.
  */
object CdcQueries {

  private def changes(s: org.apache.spark.sql.SparkSession, dir: String) =
    ChangeModel.fromLog(
      t(s, dir, "events"),
      seq = col("event_id"),
      deleteWhen = col("event_type") === "error")

  val all: Seq[QueryDef] = Seq(

    // Materialize latest state per key (record_store.rs PK-lookup semantics)
    QueryDef("q29_cdc_apply",
      """WITH ranked AS (
        |  SELECT user_id, event_type, value, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_id AS last_event, value AS last_value
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'""".stripMargin) { (s, dir) =>
      ChangeModel.applyChanges(changes(s, dir), Seq("user_id"))
        .select(col("user_id"), col("event_id").as("last_event"),
          col("value").as("last_value"))
    },

    // Retraction-correct SUM/COUNT (aggregation/processor.rs:48-586)
    QueryDef("q30_cdc_agg",
      """SELECT user_id % 10 AS cohort,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS BIGINT) AS net_count,
        |  CAST(SUM(CASE WHEN event_type = 'error'
        |       THEN -CAST(value AS DECIMAL(18,6)) ELSE CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS net_sum
        |FROM events GROUP BY 1
        |HAVING SUM(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) > 0""".stripMargin) { (s, dir) =>
      ChangeModel.aggregate(
        changes(s, dir),
        groupCols = Seq((col("user_id") % 10).as("cohort")),
        measures = Seq("net_sum_dec" -> col("value").cast(DecimalType(18, 6))))
        .select(col("cohort"),
          col("_net_count").as("net_count"),
          col("net_sum_dec").cast("double").as("net_sum"))
    },

    // Retractable MIN/MAX via multiset buffer (aggregator.rs:64-106):
    // every event inserts its value, error events also retract it; the
    // surviving multiset is exactly the non-error values.
    QueryDef("q31_retract_minmax",
      """SELECT user_id % 10 AS cohort,
        |  MIN(value) FILTER (WHERE event_type <> 'error') AS min_val,
        |  MAX(value) FILTER (WHERE event_type <> 'error') AS max_val
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val inserts = ev.select((col("user_id") % 10).as("cohort"),
        col("value"), lit(1L).as("w"))
      val deletes = ev.filter(col("event_type") === "error")
        .select((col("user_id") % 10).as("cohort"), col("value"), lit(-1L).as("w"))
      inserts.union(deletes)
        .groupBy(col("cohort"))
        .agg(
          RetractableExtremum.retractMin(col("value"), col("w")).as("min_val"),
          RetractableExtremum.retractMax(col("value"), col("w")).as("max_val"))
    },

    // Debezium-envelope decode end-to-end (replicator.rs's WAL decode as
    // a Spark source): a deterministic change feed generated from the
    // orders table — snapshot reads (`op:r`, flat envelope), updates
    // (`op:u`, payload-wrapped) for keys %3=0, deletes (`op:d`, wrapped)
    // for keys %7=0 — is serialized to JSON, decoded back through
    // Debezium.decode, and applied; the oracle states the final table.
    QueryDef("q47_debezium_cdc",
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val row = struct(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val updatedRow = struct(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"), col("o_totalprice"))
      def src(lsn: org.apache.spark.sql.Column) = struct(lsn.as("lsn"))
      // One scan builds all three phases: per order an array of
      // [snapshot r (flat envelope), conditional wrapped u, conditional
      // wrapped d], exploded — no triple read of the source
      val none = array().cast("array<string>")
      val feed = par(s, o).select(explode(concat(
        // snapshot phase (SnapshottingStarted..Done window)
        array(to_json(struct(
          row.as("after"),
          src(col("o_orderkey")).as("source"),
          lit("r").as("op")))),
        // streaming phase: payload-wrapped envelopes
        when(col("o_orderkey") % 3 === 0, array(to_json(struct(struct(
          row.as("before"), updatedRow.as("after"),
          src(col("o_orderkey") + 10000000L).as("source"),
          lit("u").as("op")).as("payload"))))).otherwise(none),
        when(col("o_orderkey") % 7 === 0, array(to_json(struct(struct(
          row.as("before"),
          src(col("o_orderkey") + 20000000L).as("source"),
          lit("d").as("op")).as("payload"))))).otherwise(none)
      )).as("value"))
      val changes = Debezium.decode(feed, "value",
        o.schema.asInstanceOf[org.apache.spark.sql.types.StructType])
      ChangeModel.applyChanges(changes, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice"))
    },

    // Ethereum log decode end-to-end (the eth-log connector's wire
    // format as a Spark source, EthLogs seam): a deterministic ERC-20
    // Transfer feed generated from the orders table — custkey as the
    // indexed from-address, order value in cents as the 256-bit data
    // word, ~1% of logs marked `removed` (chain reorg) — is serialized
    // to eth_getLogs JSON, decoded back through EthLogs.decode +
    // transfers, reorg rows retracted, and aggregated per sender; the
    // oracle states the same aggregation over the raw orders.
    QueryDef("q78_eth_transfers",
      """SELECT o_custkey AS custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_transfers,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |       AS BIGINT) AS total_cents
        |FROM orders WHERE o_orderkey % 97 <> 0
        |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      def pad64(c: org.apache.spark.sql.Column) =
        concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
      val cents = (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("long")
      val feed = par(s, o).select(to_json(struct(
        lit("0x" + "ee" * 20).as("address"),
        array(lit(EthLogs.TransferSig),
          pad64(col("o_custkey")),
          pad64(col("o_custkey") + 7)).as("topics"),
        pad64(cents).as("data"),
        lit(null).cast("string").as("blockHash"),
        concat(lit("0x"), lower(hex(expr("o_orderkey div 100") + 1)))
          .as("blockNumber"),
        lit(null).cast("string").as("transactionHash"),
        concat(lit("0x"), lower(hex(col("o_orderkey") % 50)))
          .as("transactionIndex"),
        concat(lit("0x"), lower(hex(col("o_orderkey") % 100)))
          .as("logIndex"),
        (col("o_orderkey") % 97 === 0).as("removed"))).as("value"))
      EthLogs.transfers(EthLogs.decode(feed, "value"))
        .filter(col("op") === "c")
        .groupBy(conv(substring(col("from_addr"), 3, 40), 16, 10)
          .cast("long").as("custkey"))
        .agg(count(lit(1)).as("n_transfers"),
          sum(col("value")).cast("long").as("total_cents"))
    },

    // JavaScript ingestion connector (dozer-ingestion/javascript):
    // bootstrap script on the embedded ES-subset runtime → Insert/
    // Update/Delete envelopes → json_records state (whole-value
    // identity, no PK — lib.rs:25-58). Fully oracled: the script's
    // integer generation and the replay outcome are closed-form —
    // updates hit only untouched values, deletes miss already-updated
    // ones, and the JSON text matches DuckDB string assembly exactly.
    QueryDef("q95_js_ingest",
      """SELECT CASE WHEN i % 3 = 0 THEN '{"n":' || i || ',"t":1}'
        |            ELSE '{"n":' || i || '}' END AS value
        |FROM range(1, 301) t(i)
        |WHERE NOT (i % 5 = 0 AND i % 3 <> 0)""".stripMargin) { (s, _) =>
      val script =
        """ingest({ typ: "SnapshottingDone", old_val: null, new_val: null });
          |for (let i = 1; i <= 300; i++) {
          |  ingest({ typ: "Insert", old_val: null, new_val: { n: i } });
          |}
          |for (let i = 3; i <= 300; i += 3) {
          |  ingest({ typ: "Update", old_val: { n: i }, new_val: { n: i, t: 1 } });
          |}
          |for (let i = 5; i <= 300; i += 5) {
          |  // misses multiples of 15: those were rewritten by the update
          |  ingest({ typ: "Delete", old_val: { n: i }, new_val: null });
          |}
          |""".stripMargin
      graft.sources.JsIngest.jsonRecords(s, script)
    },

    // Native pgoutput wire decode end-to-end (replicator.rs streams
    // XLogData frames; xlog_mapper.rs maps Relation/Insert/Update/
    // Delete): the same deterministic change feed as q47 — inserts for
    // every order, updates (status -> 'U') for keys %3=0, deletes for
    // keys %7=0 — is ENCODED into binary pgoutput frames (Relation
    // frame first; updates arrive wrapped in the stream's XLogData
    // envelope whose WAL-start LSN carries the sequence; periodic
    // keepalives interleave), decoded back through PgOutput.changes,
    // and materialized. Encode runs distributed (map-only flatMap);
    // the only collect is the one Relation frame. Oracle states the
    // final table.
    QueryDef("q96_pgoutput_cdc",
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.cdc.PgOutput
      val relId = 16384
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val rel = PgOutput.Encode.relation(relId, "public", "orders", 'd',
        Seq(("o_orderkey", 20, true), ("o_custkey", 20, false),
          ("o_orderstatus", 25, false), ("o_totalprice", 701, false)))
      val relDf = Seq((0L, rel)).toDF("seq", "frame")
      val dataDf = par(s, o).as[(Long, Long, String, Double)].flatMap {
        case (k, c, st, tp) =>
          // Double/Long text round-trips exactly: Scala toString is
          // shortest-round-trip and from_json parses it back bit-equal.
          val row = Seq(Some(k.toString), Some(c.toString), Some(st),
            Some(tp.toString))
          val keyOnly = Seq(Some(k.toString), None, None, None)
          val ins = Seq((k, PgOutput.Encode.insert(relId, row)))
          val upd = if (k % 3 == 0) Seq((0L, PgOutput.Encode.xlogData(
            k + 10000000L, k + 10000001L, 0L,
            PgOutput.Encode.update(relId, Some(('K', keyOnly)),
              Seq(Some(k.toString), Some(c.toString), Some("U"),
                Some(tp.toString)))))) else Nil
          val del = if (k % 7 == 0) Seq((k + 20000000L,
            PgOutput.Encode.delete(relId, 'K', keyOnly))) else Nil
          val ka = if (k % 1000 == 0) Seq((0L,
            PgOutput.Encode.keepalive(k, 0L, replyRequested = false)))
          else Nil
          ins ++ upd ++ del ++ ka
      }.toDF("seq", "frame")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType)))
      PgOutput.materialize(relDf.unionAll(dataDf),
          PgOutput.Selection("orders"), schema, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice"))
    },

    // Native MySQL binlog decode end-to-end (dozer-ingestion/mysql's
    // binlog surface): a deterministic change feed from customer —
    // WriteRows for every customer, UpdateRows (mktsegment -> 'UPD')
    // for keys %4=0, DeleteRows for keys %9=0 — encoded as binary
    // row-events v2 (TABLE_MAP carries column names via the 8.0
    // COLUMN_NAME metadata TLV; an FDE declares CRC32 so every frame's
    // trailer is verified during decode), decoded back through
    // MyBinlog.changes, materialized. Oracle states the final table.
    QueryDef("q97_mysql_binlog_cdc",
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'UPD' ELSE c_mktsegment END AS segment,
        |  c_acctbal
        |FROM customer WHERE c_custkey % 9 <> 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.cdc.MyBinlog
      import graft.cdc.MyBinlog.{ColType, Encode}
      val table = Encode.Table(42L, "tpch", "customer", Seq(
        ("c_custkey", ColType.LongLong, 0),
        ("c_name", ColType.Varchar, 64),
        ("c_mktsegment", ColType.Varchar, 32),
        ("c_acctbal", ColType.Double, 8)))
      val c = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      val fde = Seq(
        (0L, Encode.formatDescription(1L, crc32 = true)),
        (2L, Encode.tableMap(table, 2L, checksum = true))).toDF("seq", "frame")
      val dataDf = par(s, c).as[(Long, String, String, Double)].flatMap {
        case (k, name, seg, bal) =>
          val row = Seq(Some(k.toString), Some(name), Some(seg),
            Some(bal.toString))
          val upd = Seq(Some(k.toString), Some(name), Some("UPD"),
            Some(bal.toString))
          val ins = Seq((0L, Encode.writeRows(table, Seq(row),
            logPos = k + 10L, checksum = true)))
          val u = if (k % 4 == 0) Seq((0L, Encode.updateRows(table,
            Seq((row, upd)), logPos = k + 10000000L, checksum = true)))
          else Nil
          val d = if (k % 9 == 0) Seq((0L, Encode.deleteRows(table,
            Seq(if (k % 4 == 0) upd else row), logPos = k + 20000000L,
            checksum = true))) else Nil
          ins ++ u ++ d
      }.toDF("seq", "frame")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      MyBinlog.materialize(fde.unionAll(dataDf),
          MyBinlog.Selection("customer"), schema, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          col("c_mktsegment").as("segment"), col("c_acctbal"))
    },

    // MongoDB change-stream decode end-to-end (dozer-ingestion/mongodb
    // lib.rs:215-250): a deterministic `collection.watch()` feed from
    // part — inserts for every part, updateLookup updates (+1 on
    // retailprice) for keys %5=0, deletes for keys %11=0, plus noise
    // events on a foreign namespace that the selection must drop —
    // serialized as change-event JSON, decoded through MongoCdc
    // (single parse + explode, no UDF), materialized. Oracle states
    // the final collection.
    QueryDef("q98_mongo_cdc",
      """SELECT p_partkey, p_name,
        |  CASE WHEN p_partkey % 5 = 0 THEN p_retailprice + 1
        |       ELSE p_retailprice END AS price,
        |  p_brand
        |FROM part WHERE p_partkey % 11 <> 0""".stripMargin) { (s, dir) =>
      import graft.cdc.MongoCdc
      val p = t(s, dir, "part").select(
        col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))
      val rowSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p_partkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("p_brand",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("p_retailprice",
          org.apache.spark.sql.types.DoubleType)))
      def ns(dbName: String, collName: String) =
        struct(lit(dbName).as("db"), lit(collName).as("coll"))
      def clusterTime(tSecs: org.apache.spark.sql.Column,
          ord: org.apache.spark.sql.Column) =
        struct(struct(tSecs.as("t"), ord.as("i")).as("$timestamp"))
      val keyDoc = struct(col("p_partkey"))
      val fullRow = struct(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))
      val updatedRow = struct(col("p_partkey"), col("p_name"), col("p_brand"),
        (col("p_retailprice") + 1).as("p_retailprice"))
      val none = array().cast("array<string>")
      val feed = par(s, p).select(explode(concat(
        array(to_json(struct(
          lit("insert").as("operationType"), ns("tpch", "part").as("ns"),
          keyDoc.as("documentKey"), fullRow.as("fullDocument"),
          clusterTime(lit(1), col("p_partkey")).as("clusterTime")))),
        when(col("p_partkey") % 5 === 0, array(to_json(struct(
          lit("update").as("operationType"), ns("tpch", "part").as("ns"),
          keyDoc.as("documentKey"),
          updatedRow.as("fullDocument"), // fullDocument: updateLookup
          clusterTime(lit(2), col("p_partkey")).as("clusterTime")))))
          .otherwise(none),
        when(col("p_partkey") % 11 === 0, array(to_json(struct(
          lit("delete").as("operationType"), ns("tpch", "part").as("ns"),
          keyDoc.as("documentKey"),
          clusterTime(lit(3), col("p_partkey")).as("clusterTime")))))
          .otherwise(none),
        // foreign-namespace noise the selection must drop
        when(col("p_partkey") % 100 === 0, array(to_json(struct(
          lit("insert").as("operationType"), ns("other", "coll").as("ns"),
          keyDoc.as("documentKey"), fullRow.as("fullDocument"),
          clusterTime(lit(9), col("p_partkey")).as("clusterTime")))))
          .otherwise(none)
      )).as("value"))
      MongoCdc.materialize(feed, "value", "tpch", "part", rowSchema,
          Seq("p_partkey"))
        .select(col("p_partkey"), col("p_name"),
          col("p_retailprice").as("price"), col("p_brand"))
    },

    // Snowflake table-stream decode end-to-end (dozer-ingestion/
    // snowflake stream_consumer.rs:62-92): a deterministic stream from
    // supplier — plain inserts, ISUPDATE delete+insert pairs (+100 on
    // acctbal) for keys %6=0, plain deletes for keys %13=0 — decoded
    // through SnowStream.changesPaired and materialized. Oracle states
    // the final table.
    QueryDef("q99_snowflake_stream",
      """SELECT s_suppkey, s_name,
        |  CASE WHEN s_suppkey % 6 = 0 THEN s_acctbal + 100
        |       ELSE s_acctbal END AS acctbal
        |FROM supplier WHERE s_suppkey % 13 <> 0""".stripMargin) { (s, dir) =>
      import graft.cdc.SnowStream
      val sup = t(s, dir, "supplier").select(
        col("s_suppkey"), col("s_name"), col("s_acctbal"))
      def srow(bal: org.apache.spark.sql.Column, action: String,
          isUpd: Boolean, seq: org.apache.spark.sql.Column) =
        struct(col("s_suppkey"), col("s_name"), bal.as("s_acctbal"),
          lit(action).as("action"), lit(isUpd).as("is_update"),
          seq.as("seq"))
      val none = array().cast(
        "array<struct<s_suppkey:bigint,s_name:string,s_acctbal:double," +
          "action:string,is_update:boolean,seq:bigint>>")
      val stream = par(s, sup).select(explode(concat(
        array(srow(col("s_acctbal"), "INSERT", isUpd = false,
          col("s_suppkey"))),
        when(col("s_suppkey") % 6 === 0, array(
          srow(col("s_acctbal"), "DELETE", isUpd = true,
            col("s_suppkey") + 10000000L),
          srow(col("s_acctbal") + 100, "INSERT", isUpd = true,
            col("s_suppkey") + 10000000L))).otherwise(none),
        when(col("s_suppkey") % 13 === 0, array(
          srow(when(col("s_suppkey") % 6 === 0, col("s_acctbal") + 100)
            .otherwise(col("s_acctbal")), "DELETE", isUpd = false,
            col("s_suppkey") + 20000000L))).otherwise(none)
      )).as("r")).select(
        col("r.s_suppkey").as("s_suppkey"), col("r.s_name").as("s_name"),
        col("r.s_acctbal").as("s_acctbal"),
        col("r.action").as(SnowStream.Action),
        col("r.is_update").as(SnowStream.IsUpdate),
        col("r.seq").as("seq"))
      SnowStream.materialize(stream, "seq", Seq("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal").as("acctbal"))
    },

    // Kafka-transported Debezium CDC end-to-end (the Kafka connector's
    // full stack: stream_consumer_basic.rs consumes topic messages and
    // maps values through the Debezium envelope; here the TRANSPORT is
    // the native RecordBatch v2 wire codec): the q47 change feed —
    // snapshot reads for every order, payload-wrapped updates for keys
    // %3=0, deletes for keys %7=0 — is packed into one v2 batch per
    // order (baseOffset = key*4, so Kafka offsets order the phases per
    // key with no global sort; CRC32C on every batch), decoded back,
    // and materialized. Encode and decode are both map-only.
    QueryDef("q101_kafka_debezium_cdc",
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.cdc.KafkaBatch
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val batches = par(s, o).as[(Long, Long, String, Double)].map {
        case (k, c, st, tp) =>
          def row(status: String) =
            s"""{"o_orderkey":$k,"o_custkey":$c,""" +
              s""""o_orderstatus":"$status","o_totalprice":$tp}"""
          val snap = s"""{"after":${row(st)},"op":"r"}"""
          val upd = s"""{"payload":{"before":${row(st)},""" +
            s""""after":${row("U")},"op":"u"}}"""
          val del = s"""{"payload":{"before":${row(if (k % 3 == 0) "U" else st)},""" +
            s""""op":"d"}}"""
          val values = Seq(snap) ++
            (if (k % 3 == 0) Seq(upd) else Nil) ++
            (if (k % 7 == 0) Seq(del) else Nil)
          (k, KafkaBatch.Encode.batch(
            baseOffset = k * 4,
            baseTimestamp = 1700000000000L + k,
            records = values.map(v => (1700000000000L + k, k.toString, v))))
      }.toDF("seq", "frame")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType)))
      graft.cdc.ChangeModel.applyChanges(
        KafkaBatch.debeziumChanges(batches, schema), Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus").as("status"), col("o_totalprice"))
    },

    // Arrow IPC ingest round-trip (dozer-ingestion/grpc/src/adapter/
    // arrow.rs: IngestArrowRequest carries an Arrow IPC stream decoded
    // with StreamReader, every record an Insert): the events table —
    // longs, strings, a double, and a µs timestamp, the adapter's full
    // scalar surface — is encoded into one IPC frame per partition
    // executor-side, decoded back map-only, and must round-trip
    // bit-exactly against the raw table. No shuffle anywhere: encode
    // and decode are both narrow.
    QueryDef("q100_arrow_ingest",
      "SELECT event_id, ts, user_id, event_type, value FROM events") {
      (s, dir) =>
      import graft.sources.ArrowIngest
      val ev = t(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ArrowIngest.decodeFrames(ArrowIngest.encodeFrames(par(s, ev)), ev.schema)
    },

    // Avro OBJECT CONTAINER FILE round-trip (the `.avro` object-store
    // format, read natively — spark-avro is not shipped): orders
    // encoded into one deflate-compressed container per partition
    // executor-side (real headers/sync markers/blocks via the avro
    // library writer path), decoded back map-only with reader-schema
    // resolution and the decimal/timestamp logical conversions. Must
    // round-trip exactly; no shuffle anywhere — encode and decode are
    // both narrow (the q100 Arrow-IPC pattern).
    QueryDef("q107_avro_container_files",
      """SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |  CAST(o_orderdate AS TIMESTAMP) AS ots
        |FROM orders""".stripMargin) { (s, dir) =>
      import graft.sources.AvroFiles
      val avroSchema =
        """{"type":"record","name":"Ord","fields":[
          |{"name":"o_orderkey","type":"long"},
          |{"name":"status","type":["null","string"]},
          |{"name":"price","type":{"type":"bytes","logicalType":"decimal",
          |"precision":12,"scale":2}},
          |{"name":"ots","type":{"type":"long",
          |"logicalType":"timestamp-micros"}}]}""".stripMargin.replace("\n", "")
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(12,2)").as("price"),
        col("o_orderdate").cast("timestamp").as("ots"))
      val decoded = AvroFiles.decodeContainers(
        AvroFiles.encodeContainers(par(s, o), avroSchema), avroSchema)
      decoded.select(col("o_orderkey"), col("status"),
        col("price").cast("double").as("price"), col("ots"))
    },

    // Connect-JSON CDC with IN-BAND schemas over the Kafka transport
    // (kafka/src/debezium/{stream_consumer,schema,mapper}.rs — the
    // schema-registry consumption path: every message carries its
    // Connect schema struct; the table schema, logical types, and
    // primary key are all derived from the messages, nothing
    // caller-declared): orders replayed as schema-carrying envelopes —
    // snapshot reads, status updates for keys %3=0, deletes for keys
    // %13=0 — with o_totalprice as a base64 Connect Decimal(12,2),
    // o_orderdate as io.debezium.time.MicroTimestamp AND as an
    // io.debezium.time.Date epoch-day column, packed into RecordBatch
    // v2 frames (offsets order phases per key, no global sort), then
    // records → ConnectJson.changes (1-row schema sample, map-only
    // decode) → applyChanges on the key-schema-derived pk.
    QueryDef("q103_connect_schema_cdc",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS odate
        |FROM orders WHERE o_orderkey % 13 <> 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.cdc.{ConnectJson, KafkaBatch}
      val schemaJson =
        """{"type":"struct","fields":[
          |{"type":"struct","field":"before","optional":true},
          |{"type":"struct","field":"after","optional":true,"fields":[
          |{"type":"int64","field":"o_orderkey","optional":false},
          |{"type":"string","field":"status","optional":true},
          |{"type":"bytes","field":"price","optional":true,
          |"name":"org.apache.kafka.connect.data.Decimal",
          |"parameters":{"scale":"2","connect.decimal.precision":"12"}},
          |{"type":"int64","field":"ots","optional":true,
          |"name":"io.debezium.time.MicroTimestamp"},
          |{"type":"int32","field":"odate","optional":true,
          |"name":"io.debezium.time.Date"}]}]}"""
          .stripMargin.replace("\n", "")
      val keySchemaJson =
        """{"type":"struct","fields":[{"type":"int64","field":"o_orderkey"}]}"""
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long"), col("o_orderstatus"),
        col("o_totalprice").cast("double"), col("o_orderdate").cast("timestamp"))
      def encode(k: Long, st: String, tp: Double, ts: java.sql.Timestamp)
          : (Long, Array[Byte]) = {
          val cents = java.math.BigDecimal.valueOf(tp)
            .setScale(2, java.math.RoundingMode.HALF_UP).unscaledValue()
          val priceB64 = java.util.Base64.getEncoder
            .encodeToString(cents.toByteArray)
          val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L +
            ts.getNanos / 1000L
          val days = Math.floorDiv(micros, 86400000000L)
          def row(status: String) =
            s"""{"o_orderkey":$k,"status":"$status","price":"$priceB64",""" +
              s""""ots":$micros,"odate":$days}"""
          val key = s"""{"schema":$keySchemaJson,"payload":{"o_orderkey":$k}}"""
          def env(payload: String) = s"""{"schema":$schemaJson,"payload":$payload}"""
          val snap = env(s"""{"op":"r","after":${row(st)}}""")
          val upd = env(s"""{"op":"u","before":${row(st)},"after":${row("U")}}""")
          val del = env(s"""{"op":"d","before":${row(if (k % 3 == 0) "U" else st)}}""")
          val values = Seq(snap) ++
            (if (k % 3 == 0) Seq(upd) else Nil) ++
            (if (k % 13 == 0) Seq(del) else Nil)
          (k, KafkaBatch.Encode.batch(
            baseOffset = k * 4,
            baseTimestamp = 1700000000000L + k,
            records = values.map(v => (1700000000000L + k, key, v))))
      }
      val batches = par(s, o).as[(Long, String, Double, java.sql.Timestamp)]
        .map { case (k, st, tp, ts) => encode(k, st, tp, ts) }
        .toDF("seq", "frame")
      val recs = KafkaBatch.records(batches)
      // IN-BAND schema derivation, from a 1-row sample FEED: every
      // message carries the same Connect schema struct, so the contract
      // derives from one encoded message without forcing the 32-way
      // parallel encode's whole map side through the sample's limit(1)
      // (r19: the sample pass alone re-ran the full encode)
      val sample = KafkaBatch.records(
        o.limit(1).as[(Long, String, Double, java.sql.Timestamp)]
          .map { case (k, st, tp, ts) => encode(k, st, tp, ts) }
          .toDF("seq", "frame"))
      val d = ConnectJson.deriveFromFeed(sample, "value", Some("key"))
      val ch = ConnectJson.decodeWith(d, recs, "value",
        seq = Some(col(ChangeModel.SeqCol)))
      val pk = d.primaryKey
      val applied = ChangeModel.applyChanges(ch, pk)
      // The Connect Decimal / Debezium Date decodes are the point of this
      // query: assert the in-band-schema-derived types, then emit the
      // suite's hash-stable representations (DOUBLE / TIMESTAMP — raw
      // DECIMAL and DATE columns are not rendered identically by the
      // DuckDB-oracle hasher, CORRECTNESS_r08 q103).
      require(applied.schema("price").dataType ==
        org.apache.spark.sql.types.DecimalType(12, 2),
        s"Connect Decimal decode lost its type: ${applied.schema("price")}")
      require(applied.schema("odate").dataType ==
        org.apache.spark.sql.types.DateType,
        s"Debezium Date decode lost its type: ${applied.schema("odate")}")
      applied.select(col("o_orderkey"), col("status"),
        col("price").cast("double").as("price"),
        col("odate").cast("timestamp").as("odate"))
    },

    // Confluent-framed AVRO Debezium CDC (the registry path's binary
    // format — kafka/src/debezium/schema_registry.rs fetches Avro
    // schemas; topics carry `0x00 | schema id | avro binary`): orders
    // replayed as Avro envelope records — snapshot reads, status
    // updates ('A') for keys %4=0, deletes for keys %9=0 — with
    // price as an Avro decimal(12,2) logical (unscaled BE bytes),
    // odate as date-logical int, ots as timestamp-micros long.
    // Encode is distributed (one frame per order, map-only); decode is
    // the per-partition GenericDatumReader path; the one shuffle is
    // applyChanges' key shuffle.
    QueryDef("q104_avro_registry_cdc",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 4 = 0 THEN 'A' ELSE o_orderstatus END AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS odate,
        |  o_orderdate AS ots
        |FROM orders WHERE o_orderkey % 9 <> 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.cdc.AvroConfluent
      val envSchema =
        """{"type":"record","name":"Envelope","fields":[
          |{"name":"before","type":["null",{"type":"record","name":"OrderVal","fields":[
          |{"name":"o_orderkey","type":"long"},
          |{"name":"status","type":["null","string"]},
          |{"name":"price","type":["null",{"type":"bytes",
          |"logicalType":"decimal","precision":12,"scale":2}]},
          |{"name":"odate","type":["null",{"type":"int","logicalType":"date"}]},
          |{"name":"ots","type":["null",{"type":"long",
          |"logicalType":"timestamp-micros"}]}]}]},
          |{"name":"after","type":["null","OrderVal"]},
          |{"name":"op","type":"string"}]}""".stripMargin.replace("\n", "")
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long"), col("o_orderstatus"),
        col("o_totalprice").cast("double"), col("o_orderdate").cast("timestamp"))
      val frames = par(s, o).as[(Long, String, Double, java.sql.Timestamp)].flatMap {
        case (k, st, tp, ts) =>
          val price = java.math.BigDecimal.valueOf(tp)
            .setScale(2, java.math.RoundingMode.HALF_UP)
          val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L +
            ts.getNanos / 1000L
          val day = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            Math.floorDiv(micros, 86400000000L)))
          def img(status: String): Seq[Any] = Seq(k, status, price, day, ts)
          def env(op: String, before: Seq[Any], after: Seq[Any]) =
            AvroConfluent.Encode.record(envSchema, 42, Seq(before, after, op))
          val msgs = Seq((k * 4, env("r", null, img(st)))) ++
            (if (k % 4 == 0)
              Seq((k * 4 + 1, env("u", img(st), img("A")))) else Nil) ++
            (if (k % 9 == 0)
              Seq((k * 4 + 2, env("d",
                img(if (k % 4 == 0) "A" else st), null))) else Nil)
          msgs
      }.toDF("seq", "value")
      val ch = AvroConfluent.changes(frames, "value", envSchema)
      val applied = ChangeModel.applyChanges(ch, Seq("o_orderkey"))
      // Assert the Avro decimal/date logical-type decodes, then emit
      // hash-stable DOUBLE / TIMESTAMP (see q103 note; CORRECTNESS_r08
      // q104 failed on the raw DECIMAL/DATE rendering, values identical).
      require(applied.schema("price").dataType ==
        org.apache.spark.sql.types.DecimalType(12, 2),
        s"Avro decimal logical decode lost its type: ${applied.schema("price")}")
      require(applied.schema("odate").dataType ==
        org.apache.spark.sql.types.DateType,
        s"Avro date logical decode lost its type: ${applied.schema("odate")}")
      applied.select(col("o_orderkey"), col("status"),
        col("price").cast("double").as("price"),
        col("odate").cast("timestamp").as("odate"), col("ots"))
    },

    // gRPC typed ingest over the REAL wire (dozer-ingestion/grpc/src/
    // ingest.rs `ingest_stream` + adapter/default.rs): a deterministic
    // customer change feed — insert every row, +100.00 acctbal update
    // for keys %5=0, delete for keys %11=0 — is protobuf-encoded as
    // IngestRequest messages, client-streamed through a LOOPBACK
    // gRPC-over-HTTP/2 session (hand-rolled h2c server + client,
    // netty-cross-validated in GrpcIngestSpec), decoded into
    // ChangeModel rows off the push channel, and materialized.
    // Driver budget: the protobuf feed is collected (~2 MB at sf0.1 —
    // the loopback transport is driver-side by construction, like the
    // reference's in-process tonic test server); the channel is sized
    // to the snapshot replay since no consumer evicts mid-push.
    QueryDef("q102_grpc_typed_cdc",
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal,
        |  c_nationkey
        |FROM customer WHERE c_custkey % 11 <> 0""".stripMargin) { (s, dir) =>
      import graft.sources.{GrpcClient, GrpcIngest, PushBuffer, Sources}
      import graft.sources.GrpcIngest.Pbuf
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType),
        StructField("c_nationkey", LongType)))
      val rows = t(s, dir, "customer")
        .select(col("c_custkey").cast("long"), col("c_name"),
          col("c_acctbal").cast("double"), col("c_nationkey").cast("long"))
        .orderBy("c_custkey").collect()
      def vals(k: Long, n: String, b: Double, nk: Long): Seq[Pbuf.Writer] = Seq(
        new Pbuf.Writer().int(3, k), new Pbuf.Writer().str(7, n),
        new Pbuf.Writer().fixed64(5, java.lang.Double.doubleToLongBits(b)),
        new Pbuf.Writer().int(3, nk))
      var seqNo = 0L
      val messages = rows.iterator.flatMap { r =>
        val k = r.getLong(0); val n = r.getString(1)
        val b = r.getDouble(2); val nk = r.getLong(3)
        def req(typ: Int, old: Seq[Pbuf.Writer], nw: Seq[Pbuf.Writer]) = {
          seqNo += 1
          val w = new Pbuf.Writer().str(1, "customer").int(2, typ.toLong)
          old.foreach(w.embedded(3, _))
          nw.foreach(w.embedded(4, _))
          w.int(5, seqNo).result
        }
        Seq(req(GrpcIngest.OpInsert, Nil, vals(k, n, b, nk))) ++
          (if (k % 5 == 0)
            Seq(req(GrpcIngest.OpUpdate, vals(k, n, b, nk),
              vals(k, n, b + 100.0, nk))) else Nil) ++
          (if (k % 11 == 0)
            Seq(req(GrpcIngest.OpDelete,
              vals(k, n, if (k % 5 == 0) b + 100.0 else b, nk), Nil)) else Nil)
      }.toSeq
      val chan = "q102-grpc"
      PushBuffer.clear(chan)
      PushBuffer.configure(chan, math.max(PushBuffer.DefaultCapacity,
        messages.length + 16))
      val server = GrpcIngest.start(0,
        Map("customer" -> GrpcIngest.TableSpec(schema, chan)))
      try {
        val client = new GrpcClient("127.0.0.1", server.port)
        try {
          val (hdrs, _) = client.call(
            "/dozer.ingest.IngestService/ingest_stream", messages)
          require(hdrs.get("grpc-status").contains("0"),
            s"grpc ingest failed: $hdrs")
        } finally client.close()
        val feed = Sources.pushSnapshot(s, chan)
        ChangeModel.applyChanges(
          GrpcIngest.changes(feed, "customer", schema), Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"),
            col("c_acctbal").as("bal"), col("c_nationkey"))
      } finally server.stop()
    },

    // SNAPSHOT DIFF → CDC: the re-snapshot connector seam — two
    // deterministic generations of orders (rows leave, rows arrive,
    // some totals change) diffed into insert/delete/update_postimage
    // ops by ONE full-outer key join. The oracle states the same
    // classification in SQL; identical rows emit nothing.
    QueryDef("q118_snapshot_diff",
      """WITH oldt AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |), newt AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 5 <> 0
        |)
        |SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |  COALESCE(n.o_totalprice, o.o_totalprice) AS o_totalprice,
        |  COALESCE(n.o_orderpriority, o.o_orderpriority) AS o_orderpriority,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update_postimage' END AS _op,
        |  CAST(1 AS BIGINT) AS _seq
        |FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority""".stripMargin) {
      (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")))
      graft.cdc.SnapshotDiff.changes(oldSnap, newSnap, Seq("o_orderkey"))
    },

    // WEBHOOK connector end-to-end over the REAL HTTP listener
    // (dozer-ingestion/webhook/src/server.rs: POST inserts, PUT
    // updates, DELETE deletes; bodies are row objects or arrays): the
    // driver plays the EXTERNAL CLIENT — it collects the customer
    // slice (the one collect, simulating the system that would POST
    // from outside; the pipeline side stays distributed), sends
    // inserts for every customer, PUT post-images (segment -> 'W') for
    // keys %4=0 and key-only DELETEs for %9=0 in 500-row array bodies,
    // then decodes the push channel with from_json and materializes by
    // PK. Closes the q96/q97 pattern for the last 🧪-only source
    // family. Oracle states the final table.
    QueryDef("q169_webhook_cdc",
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'W' ELSE c_mktsegment END AS segment,
        |  c_acctbal
        |FROM customer WHERE c_custkey % 9 <> 0""".stripMargin) { (s, dir) =>
      import graft.sources.{PushBuffer, Sources, WebhookServer}
      val chan = "q169_webhook"
      PushBuffer.clear(chan)
      val srv = WebhookServer.start(0, Map("/ingest" -> chan))
      try {
        val rows = t(s, dir, "customer").select(
          col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal")).collect()
        // the rig's change volume is bounded by the slice it feeds —
        // size the channel to it (production tails consume as they go)
        PushBuffer.configure(chan, math.max(
          PushBuffer.DefaultCapacity, rows.length * 2))
        val http = java.net.http.HttpClient.newHttpClient()
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        def send(verb: String, body: String): Unit = {
          val resp = http.send(java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(
              s"http://127.0.0.1:${srv.port}/ingest"))
            .method(verb,
              java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200,
            s"$verb -> ${resp.statusCode()}: ${resp.body()}")
        }
        def img(r: org.apache.spark.sql.Row, seg: String) = {
          val n = om.createObjectNode()
          n.put("c_custkey", r.getLong(0)); n.put("c_name", r.getString(1))
          n.put("c_mktsegment", seg); n.put("c_acctbal", r.getDouble(3))
          n
        }
        rows.grouped(500).foreach { g =>
          val arr = om.createArrayNode()
          g.foreach(r => arr.add(img(r, r.getString(2))))
          send("POST", om.writeValueAsString(arr))
        }
        rows.filter(_.getLong(0) % 4 == 0).grouped(500).foreach { g =>
          val arr = om.createArrayNode()
          g.foreach(r => arr.add(img(r, "W")))
          send("PUT", om.writeValueAsString(arr))
        }
        rows.filter(_.getLong(0) % 9 == 0).grouped(500).foreach { g =>
          val arr = om.createArrayNode()
          g.foreach { r =>
            val n = om.createObjectNode()
            n.put("c_custkey", r.getLong(0)); arr.add(n)
          }
          send("DELETE", om.writeValueAsString(arr))
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c_custkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("c_mktsegment",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("c_acctbal",
            org.apache.spark.sql.types.DoubleType)))
        ChangeModel.applyChanges(
            WebhookServer.changes(Sources.pushSnapshot(s, chan), schema),
            Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"),
            col("c_mktsegment").as("segment"), col("c_acctbal"))
      } finally srv.stop()
    }
  )
}
