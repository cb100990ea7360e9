package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, MyBinlog}
import graft.cdc.MyBinlog.{ColType, Encode, Selection}

/** MySQL binlog wire-codec tests: every decode runs against bytes the
  * sibling encoder produced (row-based v2 events, TABLE_MAP with the
  * 8.0 COLUMN_NAME metadata TLV, optional CRC32 trailers).
  */
class MyBinlogSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val users = Encode.Table(23L, "shop", "users", Seq(
    ("id", ColType.LongLong, 0),
    ("name", ColType.Varchar, 64),
    ("score", ColType.Double, 8)))

  private def framesDf(frames: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    frames.toDF("seq", "frame")
  }

  private def decoded(frames: Seq[(Long, Array[Byte])],
      sel: Selection = Selection("users")) =
    MyBinlog.changes(framesDf(frames), Seq(sel))
      .orderBy(col("_seq"), col("_op").desc) // preimage before postimage
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("write/update/delete rows round-trip to envelope rows") {
    val out = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      2L -> Encode.writeRows(users,
        Seq(Seq(Some("1"), Some("ann"), Some("1.5")))),
      3L -> Encode.updateRows(users, Seq((
        Seq(Some("1"), Some("ann"), Some("1.5")),
        Seq(Some("1"), Some("ann2"), Some("2.5"))))),
      4L -> Encode.deleteRows(users,
        Seq(Seq(Some("1"), Some("ann2"), Some("2.5")))),
      5L -> Encode.xid(77L)))
    assert(out == Seq(
      ("shop.users", ChangeModel.Insert, 2L,
        """{"id":1,"name":"ann","score":1.5}"""),
      ("shop.users", ChangeModel.UpdatePre, 3L,
        """{"id":1,"name":"ann","score":1.5}"""),
      ("shop.users", ChangeModel.UpdatePost, 3L,
        """{"id":1,"name":"ann2","score":2.5}"""),
      ("shop.users", ChangeModel.Delete, 4L,
        """{"id":1,"name":"ann2","score":2.5}""")))
  }

  test("multi-row events emit one change per row image") {
    val out = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      2L -> Encode.writeRows(users, Seq(
        Seq(Some("1"), Some("a"), Some("1.0")),
        Seq(Some("2"), Some("b"), Some("2.0")),
        Seq(Some("3"), Some("c"), Some("3.0"))))))
    assert(out.map(_._4) == Seq(
      """{"id":1,"name":"a","score":1.0}""",
      """{"id":2,"name":"b","score":2.0}""",
      """{"id":3,"name":"c","score":3.0}"""))
  }

  test("NULL bitmap hits become explicit JSON nulls") {
    val out = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      2L -> Encode.writeRows(users, Seq(Seq(Some("5"), None, None)))))
    assert(out == Seq(("shop.users", ChangeModel.Insert, 2L,
      """{"id":5,"name":null,"score":null}""")))
  }

  test("integer type matrix round-trips signed values") {
    val t = Encode.Table(9L, "", "nums", Seq(
      ("t", ColType.Tiny, 0), ("s", ColType.Short, 0),
      ("i", ColType.Long, 0), ("b", ColType.LongLong, 0),
      ("f", ColType.Float, 4)))
    val out = decoded(Seq(
      1L -> Encode.tableMap(t, 0L, checksum = false),
      2L -> Encode.writeRows(t, Seq(
        Seq(Some("-5"), Some("-300"), Some("-70000"),
          Some("-5000000000"), Some("1.5"))))),
      Selection("nums"))
    assert(out == Seq(("nums", ChangeModel.Insert, 2L,
      """{"t":-5,"s":-300,"i":-70000,"b":-5000000000,"f":1.5}""")))
  }

  test("CRC32 trailers are stripped and verified after an FDE declares them") {
    val frames = Seq(
      1L -> Encode.formatDescription(1L, crc32 = true),
      2L -> Encode.tableMap(users, 0L, checksum = true),
      3L -> Encode.writeRows(users,
        Seq(Seq(Some("1"), Some("a"), Some("1.0"))), checksum = true))
    assert(decoded(frames).map(_._2) == Seq(ChangeModel.Insert))
    // flip a payload byte: loud CRC error, not silent garbage
    val corrupt = frames.map { case (seq, f) =>
      if (seq == 3L) { val c = f.clone(); c(25) = (c(25) ^ 1).toByte; (seq, c) }
      else (seq, f)
    }
    val e = intercept[Exception] { decoded(corrupt) }
    assert(e.getMessage.contains("CRC32 mismatch"))
  }

  test("header log_pos overrides the row seq") {
    val out = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      999L -> Encode.writeRows(users,
        Seq(Seq(Some("2"), Some("w"), Some("1.0"))), logPos = 42L)))
    assert(out.map(_._3) == Seq(42L))
  }

  test("table_id reuse by a different table is versioned by seq") {
    val orders = Encode.Table(23L, "shop", "orders", Seq(
      ("oid", ColType.LongLong, 0), ("total", ColType.Double, 8)))
    val out = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      2L -> Encode.writeRows(users,
        Seq(Seq(Some("1"), Some("a"), Some("1.0")))),
      10L -> Encode.tableMap(orders, 0L, checksum = false),
      11L -> Encode.writeRows(orders, Seq(Seq(Some("7"), Some("9.5"))))),
      Selection("users"))
    // only the users rows decode under Selection("users"); the orders
    // event resolves to the orders meta (not selected -> needs its own run)
    assert(out.map(_._4) == Seq("""{"id":1,"name":"a","score":1.0}"""))
    val out2 = decoded(Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      10L -> Encode.tableMap(orders, 0L, checksum = false),
      11L -> Encode.writeRows(orders, Seq(Seq(Some("7"), Some("9.5"))))),
      Selection("orders"))
    assert(out2 == Seq(("shop.orders", ChangeModel.Insert, 11L,
      """{"oid":7,"total":9.5}""")))
  }

  test("column type change for the same table raises") {
    val usersV2 = Encode.Table(23L, "shop", "users", Seq(
      ("id", ColType.LongLong, 0),
      ("name", ColType.Varchar, 64),
      ("score", ColType.Float, 4)))
    val e = intercept[Exception] {
      decoded(Seq(
        1L -> Encode.tableMap(users, 0L, checksum = false),
        2L -> Encode.tableMap(usersV2, 0L, checksum = false),
        3L -> Encode.writeRows(users,
          Seq(Seq(Some("1"), Some("a"), Some("1.0"))))))
    }
    assert(e.getMessage.contains("column type changed"))
  }

  test("varchar with max length over 255 uses a 2-byte length prefix") {
    val t = Encode.Table(5L, "", "docs", Seq(
      ("id", ColType.LongLong, 0), ("body", ColType.Varchar, 1024)))
    val long = "x" * 300
    val out = decoded(Seq(
      1L -> Encode.tableMap(t, 0L, checksum = false),
      2L -> Encode.writeRows(t, Seq(Seq(Some("1"), Some(long))))),
      Selection("docs"))
    assert(out.head._4 == s"""{"id":1,"body":"$long"}""")
  }

  test("materialize: binlog frames to latest surviving state per key") {
    val frames = Seq(
      1L -> Encode.tableMap(users, 0L, checksum = false),
      2L -> Encode.writeRows(users, Seq(
        Seq(Some("1"), Some("a"), Some("1.0")),
        Seq(Some("2"), Some("b"), Some("2.0")))),
      3L -> Encode.updateRows(users, Seq((
        Seq(Some("1"), Some("a"), Some("1.0")),
        Seq(Some("1"), Some("a2"), Some("9.0"))))),
      4L -> Encode.deleteRows(users, Seq(Seq(Some("2"), Some("b"), Some("2.0")))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val state = MyBinlog.materialize(framesDf(frames),
        Selection("users"), schema, Seq("id"))
      .select("id", "name", "score").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(state == Seq((1L, "a2", 9.0)))
  }

  test("dead letter: CRC mismatch and truncated events land in malformed, lenient survives") {
    val goodWrite = Encode.writeRows(users,
      Seq(Seq(Some("1"), Some("a"), Some("1.0"))), checksum = true)
    val crcBroken = { val c = goodWrite.clone(); c(25) = (c(25) ^ 1).toByte; c }
    val truncated = goodWrite.take(10) // shorter than the v4 header
    val frames = Seq(
      1L -> Encode.formatDescription(1L, crc32 = true),
      2L -> Encode.tableMap(users, 0L, checksum = true),
      3L -> goodWrite,
      4L -> crcBroken,
      5L -> truncated,
      6L -> Encode.writeRows(users,
        Seq(Seq(Some("2"), Some("b"), Some("2.0"))), checksum = true))
    // strict decode is loud
    intercept[Exception] { decoded(frames) }
    // lenient decode survives: the two good writes come through
    val ok = MyBinlog.changesLenient(framesDf(frames), Seq(Selection("users")))
      .orderBy("_seq").collect().map(r => r.getString(3)).toSeq
    assert(ok == Seq(
      """{"id":1,"name":"a","score":1.0}""",
      """{"id":2,"name":"b","score":2.0}"""))
    // corrupt events dead-letter with reasons
    val dlq = MyBinlog.malformed(framesDf(frames), Seq(Selection("users")))
      .orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dlq.map(_._1) == Seq(4L, 5L))
    assert(dlq.exists(_._2.contains("CRC32 mismatch")))
  }
}
