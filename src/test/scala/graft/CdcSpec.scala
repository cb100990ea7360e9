package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{ChangeModel, RetractableExtremum}

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
}
