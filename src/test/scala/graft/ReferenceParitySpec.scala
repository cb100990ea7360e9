package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.ChangeModel

/** Replays the reference's SQL-logic-test shape (SURVEY §5.1:
  * dozer-tests/src/sql_tests/full — INSERT/UPDATE/DELETE phases,
  * then queries asserted with rowsort): mutations flow through the CDC
  * change model and the materialized state must answer queries exactly
  * as a from-scratch recompute would — the property dozer's incremental
  * operators are tested for.
  *
  * Fixture mirrors the Sakila-like trio (actor/film/film_actor,
  * FIXTURES.md §1) with graft's own rows.
  */
class ReferenceParitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import ChangeModel.{Delete, Insert, OpCol, SeqCol, UpdatePost, UpdatePre}

  private def actorChanges = {
    import spark.implicits._
    // insert 1..6, then: update 2's last_name, delete 5 — the
    // mutation-phase pattern of agg.test/join.test
    val inserts = (1 to 6).map(i =>
      (i.toLong, s"first_$i", s"last_$i", Insert, i.toLong))
    val mutations = Seq(
      (2L, "first_2", "last_2", UpdatePre, 7L),
      (2L, "first_2", "renamed", UpdatePost, 7L),
      (5L, "first_5", "last_5", Delete, 8L))
    (inserts ++ mutations)
      .toDF("actor_id", "first_name", "last_name", OpCol, SeqCol)
  }

  private def filmActorChanges = {
    import spark.implicits._
    // bridge rows (actor_id, film_id): actor 1 in 3 films, 2 in 2, 5 in 1
    val rows = Seq((1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 101L), (2L, 104L), (5L, 105L))
    val changes = rows.zipWithIndex.map { case ((a, f), i) =>
      (a, f, Insert, 100L + i)
    } ++ Seq((5L, 105L, Delete, 200L)) // cascade of actor 5's deletion
    changes.toDF("actor_id", "film_id", OpCol, SeqCol)
  }

  test("GROUP BY count answers match recompute after update+delete replay") {
    val state = ChangeModel.applyChanges(actorChanges, Seq("actor_id"))
    state.createOrReplaceTempView("actor_state")
    val rows = spark.sql(
      "SELECT actor_id, count(actor_id) AS n FROM actor_state GROUP BY actor_id")
      .orderBy("actor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // actors 1,2,3,4,6 remain, once each (5 deleted)
    assert(rows == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (6L, 1L)))
    // the update is visible in state
    val renamed = spark.sql(
      "SELECT last_name FROM actor_state WHERE actor_id = 2").collect()
    assert(renamed.map(_.getString(0)).toSeq == Seq("renamed"))
  }

  test("multi-key equi-join over replayed states matches recompute (join.test shape)") {
    val actors = ChangeModel.applyChanges(actorChanges, Seq("actor_id"))
    val bridge = ChangeModel.applyChanges(filmActorChanges, Seq("actor_id", "film_id"))
    val joined = actors.join(bridge, "actor_id")
      .groupBy(col("actor_id"), col("last_name"))
      .agg(count(col("film_id")).as("n_films"))
      .orderBy("actor_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // actor 5's bridge row deleted with it -> no orphans
    assert(joined == Seq((1L, "last_1", 3L), (2L, "renamed", 2L)))
  }

  test("UNION distinct emits each value once after replay (union.test shape)") {
    val actors = ChangeModel.applyChanges(actorChanges, Seq("actor_id"))
    val bridge = ChangeModel.applyChanges(filmActorChanges, Seq("actor_id", "film_id"))
    val union = actors.select(col("actor_id"))
      .union(bridge.select(col("actor_id"))).distinct()
      .orderBy("actor_id").collect().map(_.getLong(0)).toSeq
    assert(union == Seq(1L, 2L, 3L, 4L, 6L))
  }

  test("incremental aggregation equals batch recompute (retraction path)") {
    // dozer's aggregation tests drive Insert/Update/Delete ops and assert
    // emitted aggregates; here: weighted retraction agg == agg of state
    val viaRetraction = ChangeModel.aggregate(
      actorChanges, Seq(col("last_name")), Seq("cnt" -> lit(1L)))
      .select(col("last_name"), col("_net_count").as("n"))
    val viaRecompute = ChangeModel.applyChanges(actorChanges, Seq("actor_id"))
      .groupBy(col("last_name")).agg(count(lit(1)).as("n"))
    assert(viaRetraction.exceptAll(viaRecompute).isEmpty &&
      viaRecompute.exceptAll(viaRetraction).isEmpty)
  }
}
