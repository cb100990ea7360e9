package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, MongoCdc, SnowStream}

/** MongoDB change-stream and Snowflake table-stream decoder semantics
  * beyond the oracled q98/q99 paths.
  */
class CdcStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val rowSchema = StructType(Seq(
    StructField("_id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def mongo(events: Seq[String]) = {
    import spark.implicits._
    MongoCdc.changes(events.toDF("value"), "value", "db", "c",
      rowSchema, Seq("_id"))
      .orderBy(col(ChangeModel.SeqCol), col(ChangeModel.OpCol).desc)
      .collect()
  }

  test("mongo: insert/update/delete map like the reference") {
    val rows = mongo(Seq(
      """{"operationType":"insert","ns":{"db":"db","coll":"c"},
        |"documentKey":{"_id":1},
        |"fullDocument":{"_id":1,"name":"a","score":1.5},
        |"clusterTime":{"$timestamp":{"t":1,"i":1}}}""".stripMargin,
      """{"operationType":"update","ns":{"db":"db","coll":"c"},
        |"documentKey":{"_id":1},
        |"fullDocument":{"_id":1,"name":"b","score":2.5},
        |"clusterTime":{"$timestamp":{"t":2,"i":1}}}""".stripMargin,
      """{"operationType":"delete","ns":{"db":"db","coll":"c"},
        |"documentKey":{"_id":1},
        |"clusterTime":{"$timestamp":{"t":3,"i":1}}}""".stripMargin))
    val ops = rows.map(_.getAs[String](ChangeModel.OpCol)).toSeq
    assert(ops == Seq(ChangeModel.Insert, ChangeModel.UpdatePre,
      ChangeModel.UpdatePost, ChangeModel.Delete))
    // seq = (t << 32) | i
    assert(rows.map(_.getAs[Long](ChangeModel.SeqCol)).toSeq ==
      Seq((1L << 32) + 1, (2L << 32) + 1, (2L << 32) + 1, (3L << 32) + 1))
    // update preimage is key-only (reference: old = (id, Null))
    val pre = rows(1)
    assert(pre.getAs[Long]("_id") == 1L && pre.isNullAt(1) && pre.isNullAt(2))
  }

  test("mongo: replace maps to the update pair") {
    val ops = mongo(Seq(
      """{"operationType":"replace","ns":{"db":"db","coll":"c"},
        |"documentKey":{"_id":4},
        |"fullDocument":{"_id":4,"name":"r","score":0.5},
        |"clusterTime":{"$timestamp":{"t":1,"i":4}}}""".stripMargin))
      .map(_.getAs[String](ChangeModel.OpCol)).toSeq
    assert(ops == Seq(ChangeModel.UpdatePre, ChangeModel.UpdatePost))
  }

  test("mongo: delta update without updateLookup uses updatedFields; removedFields null") {
    val rows = mongo(Seq(
      """{"operationType":"update","ns":{"db":"db","coll":"c"},
        |"documentKey":{"_id":2},
        |"updateDescription":{"updatedFields":{"score":9.5},
        |"removedFields":["name"]},
        |"clusterTime":{"$timestamp":{"t":5,"i":2}}}""".stripMargin))
    val post = rows.find(
      _.getAs[String](ChangeModel.OpCol) == ChangeModel.UpdatePost).get
    assert(post.getAs[Long]("_id") == 2L)
    assert(post.isNullAt(1)) // removed field -> explicit null
    assert(post.getAs[Double]("score") == 9.5)
  }

  test("mongo: foreign namespaces are dropped, invalidation raises") {
    val ok = mongo(Seq(
      """{"operationType":"drop","ns":{"db":"other","coll":"c"},
        |"clusterTime":{"$timestamp":{"t":1,"i":1}}}""".stripMargin))
    assert(ok.isEmpty) // foreign-ns drop is not our stream's problem
    val e = intercept[Exception] {
      mongo(Seq(
        """{"operationType":"invalidate","ns":{"db":"db","coll":"c"},
          |"clusterTime":{"$timestamp":{"t":1,"i":1}}}""".stripMargin))
    }
    assert(e.getMessage.contains("change stream invalidated"))
  }

  private def streamDf(rows: Seq[(Long, String, Double, String, Boolean, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "score", "a", "u", "seq")
      .withColumnRenamed("a", SnowStream.Action)
      .withColumnRenamed("u", SnowStream.IsUpdate)
  }

  test("snowflake: reference-parity mapping is INSERT->insert, DELETE->delete") {
    val ops = SnowStream.changes(streamDf(Seq(
        (1L, "a", 1.0, "INSERT", false, 1L),
        (1L, "a", 1.0, "DELETE", true, 2L),
        (1L, "a2", 2.0, "INSERT", true, 2L))), "seq")
      .orderBy(col(ChangeModel.SeqCol))
      .collect().map(_.getAs[String](ChangeModel.OpCol)).toSeq
    assert(ops == Seq(ChangeModel.Insert, ChangeModel.Delete,
      ChangeModel.Insert))
  }

  test("snowflake: paired mapping folds ISUPDATE halves into the update pair") {
    val out = SnowStream.changesPaired(streamDf(Seq(
        (1L, "a", 1.0, "INSERT", false, 1L),
        (1L, "a", 1.0, "DELETE", true, 2L),
        (1L, "a2", 2.0, "INSERT", true, 2L))), "seq")
      .orderBy(col(ChangeModel.SeqCol), col(ChangeModel.OpCol).desc)
      .collect().map(_.getAs[String](ChangeModel.OpCol)).toSeq
    assert(out == Seq(ChangeModel.Insert, ChangeModel.UpdatePre,
      ChangeModel.UpdatePost))
  }

  test("snowflake: unknown action raises like UnsupportedActionInStream") {
    val e = intercept[Exception] {
      SnowStream.changes(streamDf(Seq(
        (1L, "a", 1.0, "TRUNCATE", false, 1L))), "seq").collect()
    }
    assert(e.getMessage.contains("unsupported METADATA$ACTION"))
  }

  test("snowflake: materialize replays the stream to final state") {
    val state = SnowStream.materialize(streamDf(Seq(
        (1L, "a", 1.0, "INSERT", false, 1L),
        (2L, "b", 2.0, "INSERT", false, 2L),
        (1L, "a", 1.0, "DELETE", true, 3L),
        (1L, "a2", 9.0, "INSERT", true, 3L),
        (2L, "b", 2.0, "DELETE", false, 4L))), "seq", Seq("id"))
      .select("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(state == Seq((1L, "a2", 9.0)))
  }
}
