package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse-style `windowFunnel`: per-user maximum sequential-step depth
  * through an ordered event chain completed within a time window of the
  * chain's FIRST event (the conversion-funnel operator the reference's
  * ClickHouse sink users run downstream; computing it in-engine keeps the
  * raw event stream out of the sink).
  *
  * Semantics (deterministic, engine-independent): events are ordered by
  * (timestamp, order-id); a chain is step events e1 < e2 < … < ek in that
  * order with us(ei) − us(e1) ≤ window for every i. The per-user level is
  * the longest reachable prefix. The fold keeps, per level, the LATEST
  * chain-start timestamp among chains reaching that level — greedy is
  * exact here because validity at each step only compares the current
  * event against the chain start, so a later start strictly dominates.
  *
  * 100 TB shape: non-step events are filtered BEFORE the single per-user
  * hash shuffle; the fold is a native higher-order `aggregate` over each
  * user's sorted step events (no UDF, no window join, state = K longs).
  * Per-user working set is that user's step-event count — the same
  * per-key bound any sessionization pays; cap hyperactive keys upstream
  * (e.g. time-bucket the funnel) if a key exceeds executor memory.
  */
object EventFunnel {

  /** Output: (userCol, funnel_level INT) — one row per user having at
    * least one step event; level 0 = step-1 event never seen.
    */
  def windowFunnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    val k = steps.size
    val ev = df
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(
          unix_micros(col(tsCol)).as("us"),
          col(orderCol).cast("long").as("ord"),
          col(typeCol).as("t")).as("e"))
    val grouped = ev.groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    val init = array(Seq.fill(k)(lit(-1L)): _*)
    val folded = aggregate(col("evs"), init, (acc: Column, e: Column) => {
      val us = e.getField("us")
      val t = e.getField("t")
      array((0 until k).map { i =>
        val cur = element_at(acc, i + 1)
        if (i == 0) when(t === steps.head, greatest(cur, us)).otherwise(cur)
        else {
          val prevStart = element_at(acc, i)
          when(
            t === steps(i) && prevStart =!= lit(-1L) &&
              (us - prevStart) <= lit(windowMicros),
            greatest(cur, prevStart)).otherwise(cur)
        }
      }: _*)
    })
    grouped.select(col(userCol),
      size(filter(folded, x => x =!= lit(-1L))).cast("int").as("funnel_level"))
  }

  /** Cohort retention: users grouped by their first-activity day, with
    * counts of how many returned at each of `offsets` days later — the
    * release-dashboard companion to [[windowFunnel]].
    *
    * Cohort days are epoch-day BIGINTs, not raw DATEs (hash-stable
    * across engines — the repo's determinism convention). One per-user
    * aggregation (min day + distinct active days, bounded by the user's
    * distinct-day count) and one tiny per-cohort aggregation; both with
    * map-side partial agg, the second over one row per user.
    *
    * Output: `cohort_day BIGINT, n_users BIGINT, n_d<o> BIGINT` per
    * offset `o`, one row per cohort day.
    */
  def retention(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty, "retention needs at least one day offset")
    val dayUs = 86400000000L
    val ev = df.select(col(userCol),
      floor(unix_micros(col(tsCol)) / dayUs).cast("long").as("__day"))
    val per = ev.groupBy(col(userCol))
      .agg(min(col("__day")).as("__d0"),
        collect_set(col("__day")).as("__days"))
    val flagged = per.select(col("__d0") +: offsets.map(o =>
      when(array_contains(col("__days"), col("__d0") + o), 1L)
        .otherwise(0L).as(s"__r$o")): _*)
    flagged.groupBy(col("__d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        offsets.map(o => sum(col(s"__r$o")).as(s"n_d$o")): _*)
  }
}
