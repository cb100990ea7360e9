package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, PgOutput}
import graft.cdc.PgOutput.{Encode, Selection}

/** Native pgoutput wire-codec tests: every decode runs against bytes the
  * sibling encoder produced, so the binary format round-trips through
  * the gate (same strategy as the Debezium / eth-log / MP4 specs).
  */
class PgOutputSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val RelId = 16384
  private val cols =
    Seq(("id", 20, true), ("name", 25, false), ("score", 701, false))
  private def rel(identity: Char = 'd') =
    Encode.relation(RelId, "public", "users", identity, cols)

  private def framesDf(frames: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    frames.toDF("seq", "frame")
  }

  private def decoded(frames: Seq[(Long, Array[Byte])],
      sel: Selection = Selection("users")) =
    PgOutput.changes(framesDf(frames), Seq(sel))
      .orderBy(col("_seq"), col("_op").desc) // preimage sorts before postimage
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("insert/update/delete round-trip to ChangeModel envelope rows") {
    val out = decoded(Seq(
      0L -> rel(),
      1L -> Encode.begin(100L, 0L, 7),
      2L -> Encode.insert(RelId,
        Seq(Some("1"), Some("ann"), Some("1.5"))),
      3L -> Encode.update(RelId,
        Some(('K', Seq(Some("1"), None, None))),
        Seq(Some("1"), Some("ann2"), Some("2.5"))),
      4L -> Encode.delete(RelId, 'K', Seq(Some("1"), None, None)),
      5L -> Encode.commit(100L, 101L, 0L)))
    assert(out == Seq(
      ("users", ChangeModel.Insert, 2L,
        """{"id":1,"name":"ann","score":1.5}"""),
      ("users", ChangeModel.UpdatePre, 3L, """{"id":1,"name":null,"score":null}"""),
      ("users", ChangeModel.UpdatePost, 3L,
        """{"id":1,"name":"ann2","score":2.5}"""),
      ("users", ChangeModel.Delete, 4L, """{"id":1,"name":null,"score":null}""")))
  }

  test("update with 'O' old tuple keeps the full preimage; 'O' delete too") {
    val out = decoded(Seq(
      0L -> rel('f'), // replica identity FULL
      1L -> Encode.insert(RelId, Seq(Some("1"), Some("a"), Some("1.0"))),
      2L -> Encode.update(RelId,
        Some(('O', Seq(Some("1"), Some("a"), Some("1.0")))),
        Seq(Some("1"), Some("b"), Some("2.0"))),
      3L -> Encode.delete(RelId, 'O', Seq(Some("1"), Some("b"), Some("2.0")))))
    assert(out(1) == ("users", ChangeModel.UpdatePre, 2L,
      """{"id":1,"name":"a","score":1.0}"""))
    assert(out(3) == ("users", ChangeModel.Delete, 3L,
      """{"id":1,"name":"b","score":2.0}"""))
  }

  test("replica identity NOTHING yields empty update preimage") {
    val out = decoded(Seq(
      0L -> rel('n'),
      1L -> Encode.update(RelId, None,
        Seq(Some("9"), Some("x"), Some("3.5")))))
    assert(out == Seq(
      ("users", ChangeModel.UpdatePre, 1L, "{}"),
      ("users", ChangeModel.UpdatePost, 1L,
        """{"id":9,"name":"x","score":3.5}""")))
  }

  test("TOAST-unchanged cell is omitted from JSON; null is explicit") {
    val out = decoded(Seq(
      0L -> rel(),
      1L -> Encode.update(RelId,
        Some(('K', Seq(Some("5"), None, None))),
        Seq(Some("5"), Encode.Toast, None)))) // name TOAST-unchanged, score NULL
    val post = out.find(_._2 == ChangeModel.UpdatePost).get
    assert(post._4 == """{"id":5,"score":null}""") // name omitted, score null
  }

  test("keepalive, truncate, origin, type and logical messages are skipped") {
    val out = decoded(Seq(
      0L -> rel(),
      1L -> Encode.keepalive(50L, 0L, replyRequested = true),
      2L -> Encode.truncate(Seq(RelId)),
      3L -> Encode.origin(10L, "node-a"),
      4L -> Encode.typeMsg(600, "public", "point"),
      5L -> Encode.insert(RelId, Seq(Some("1"), Some("z"), Some("0.5")))))
    assert(out.map(_._2) == Seq(ChangeModel.Insert))
  }

  test("XLogData wrapper's WAL-start LSN overrides the row seq") {
    val payload = Encode.insert(RelId, Seq(Some("2"), Some("w"), Some("1.0")))
    val out = decoded(Seq(
      0L -> rel(),
      999L -> Encode.xlogData(42L, 43L, 0L, payload)))
    assert(out == Seq(("users", ChangeModel.Insert, 42L,
      """{"id":2,"name":"w","score":1.0}""")))
  }

  test("column subset selection reorders and restricts the JSON") {
    val out = decoded(
      Seq(
        0L -> rel(),
        1L -> Encode.insert(RelId, Seq(Some("3"), Some("q"), Some("7.5")))),
      Selection("users", Seq("score", "id")))
    assert(out == Seq(("users", ChangeModel.Insert, 1L,
      """{"score":7.5,"id":3}""")))
  }

  test("unknown selected column fails loudly") {
    val e = intercept[Exception] {
      decoded(
        Seq(0L -> rel(),
          1L -> Encode.insert(RelId, Seq(Some("1"), Some("a"), Some("1.0")))),
        Selection("users", Seq("nope")))
    }
    assert(e.getMessage.contains("no column 'nope'"))
  }

  test("mid-stream schema change: frames decode with the version in force") {
    // v1 has (id, name); a re-sent Relation at seq 10 adds score
    val relV1 = Encode.relation(RelId, "public", "users", 'd',
      Seq(("id", 20, true), ("name", 25, false)))
    val relV2 = rel()
    val out = decoded(Seq(
      0L -> relV1,
      1L -> Encode.insert(RelId, Seq(Some("1"), Some("a"))),
      10L -> relV2,
      11L -> Encode.insert(RelId, Seq(Some("2"), Some("b"), Some("1.5")))))
    assert(out == Seq(
      ("users", ChangeModel.Insert, 1L, """{"id":1,"name":"a"}"""),
      ("users", ChangeModel.Insert, 11L,
        """{"id":2,"name":"b","score":1.5}""")))
  }

  test("column type change mid-stream raises like the reference") {
    val relV2 = Encode.relation(RelId, "public", "users", 'd',
      Seq(("id", 20, true), ("name", 23, false), ("score", 701, false)))
    val e = intercept[Exception] {
      decoded(Seq(
        0L -> rel(),
        1L -> relV2,
        2L -> Encode.insert(RelId, Seq(Some("1"), Some("2"), Some("1.0")))))
    }
    assert(e.getMessage.contains("column type changed"))
  }

  test("unselected relations are ignored entirely") {
    val other = Encode.relation(777, "public", "ignored", 'd',
      Seq(("x", 20, true)))
    val out = decoded(Seq(
      0L -> rel(),
      1L -> other,
      2L -> Encode.insert(777, Seq(Some("5"))),
      3L -> Encode.insert(RelId, Seq(Some("1"), Some("a"), Some("1.0")))))
    assert(out.map(_._1).distinct == Seq("users"))
  }

  test("materialize: frames to latest surviving state per key") {
    val frames = Seq(
      0L -> rel(),
      1L -> Encode.insert(RelId, Seq(Some("1"), Some("a"), Some("1.0"))),
      2L -> Encode.insert(RelId, Seq(Some("2"), Some("b"), Some("2.0"))),
      3L -> Encode.update(RelId,
        Some(('K', Seq(Some("1"), None, None))),
        Seq(Some("1"), Some("a2"), Some("9.0"))),
      4L -> Encode.delete(RelId, 'K', Seq(Some("2"), None, None)))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val state = PgOutput.materialize(framesDf(frames),
        Selection("users"), schema, Seq("id"))
      .select("id", "name", "score").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(state == Seq((1L, "a2", 9.0)))
  }

  test("dead letter: corrupt frames land in malformed with reasons, lenient stream survives") {
    val good = Encode.insert(RelId, Seq(Some("1"), Some("ann"), Some("1.5")))
    val truncated = good.take(good.length / 2) // mid-tuple cut
    val unknownType = Array[Byte]('Z'.toByte, 0, 0, 0, 1)
    val frames = Seq(
      0L -> rel(),
      1L -> good,
      2L -> truncated,
      3L -> unknownType,
      4L -> Encode.insert(RelId, Seq(Some("2"), Some("bob"), Some("2.5"))))
    // strict decode is loud
    intercept[org.apache.spark.SparkException] {
      PgOutput.changes(framesDf(frames), Seq(Selection("users"))).collect()
    }
    // lenient decode survives: good frames pass through
    val ok = PgOutput.changesLenient(framesDf(frames), Seq(Selection("users")))
      .orderBy("_seq").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(ok == Seq((ChangeModel.Insert, 1L), (ChangeModel.Insert, 4L)))
    // ... and the corrupt ones are dead-lettered with reasons
    val dlq = PgOutput.malformed(framesDf(frames), Seq(Selection("users")))
      .orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dlq.map(_._1) == Seq(2L, 3L))
    assert(dlq.forall(_._2.nonEmpty))
  }
}
