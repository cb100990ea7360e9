package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * Null handling (part of the contract, not an accident): rows with a
  * NULL timestamp are dropped up front — an unknown-time event cannot
  * take a position in a time-ordered chain. Callers whose ts column may
  * be mostly null should check coverage upstream; the funnel itself
  * reports only over timestamped events.
  *
  * Strict modes ([[FunnelMode]]) refine which chains count, matching the
  * ClickHouse windowFunnel mode family re-derived as REACHABILITY
  * semantics (max k such that a qualifying chain exists — the property
  * the q112 EXISTS-chain oracle established; ClickHouse's own greedy
  * scan is not reachability-exact under its strict modes, ours is):
  *  - [[FunnelMode.StrictIncrease]]: chain timestamps must STRICTLY
  *    increase (equal-ts events cannot chain).
  *  - [[FunnelMode.StrictOrder]]: chain events must be CONSECUTIVE among
  *    ALL the user's events — any interleaved event (of any type) breaks
  *    the chain. The input is therefore NOT pre-filtered to step types
  *    in this mode.
  *  - [[FunnelMode.StrictDedup]]: a repeat of a condition the chain has
  *    already satisfied (an event of type step_j, j ≤ current level,
  *    between two chain events) breaks the chain.
  *
  * 100 TB shape: non-step events are filtered BEFORE the single per-user
  * hash shuffle (except StrictOrder, whose semantics need every event —
  * the same per-key volume any sessionization of the full stream pays);
  * the default fold is a native higher-order `aggregate` (no UDF, state
  * = K longs). The strict folds are one typed function over the user's
  * sorted events — same shuffle, same per-key bound, O(K) state — used
  * because their exact guards need two-phase timestamp-group state that
  * Column-lambda folds express badly.
  */
object EventFunnel {

  sealed trait FunnelMode
  object FunnelMode {
    case object Default extends FunnelMode
    case object StrictIncrease extends FunnelMode
    case object StrictOrder extends FunnelMode
    case object StrictDedup extends FunnelMode
  }

  private def requireNoClash(userCol: String, internal: Seq[String]): Unit =
    require(!internal.contains(userCol),
      s"user column '$userCol' collides with EventFunnel's internal " +
        "working/output columns; rename it first")

  /** Output: (userCol, funnel_level INT) — one row per user having at
    * least one step event (StrictOrder: at least one event of any type,
    * since every event participates in its semantics); level 0 = step-1
    * event never seen / never chained.
    */
  def windowFunnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMicros: Long,
      mode: FunnelMode = FunnelMode.Default): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    requireNoClash(userCol, Seq("e", "evs", "funnel_level"))
    val k = steps.size
    val timed = df.filter(col(tsCol).isNotNull)
    mode match {
      case FunnelMode.Default =>
        val ev = timed
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

      case strict =>
        // step index 1..k; 0 = non-step (only StrictOrder keeps those)
        val tIdx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
          when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
        }
        val base = strict match {
          case FunnelMode.StrictOrder => timed
          case _ => timed.filter(col(typeCol).isin(steps: _*))
        }
        val ev = base.select(col(userCol),
          struct(
            unix_micros(col(tsCol)).as("us"),
            col(orderCol).cast("long").as("ord"),
            tIdx.as("t")).as("e"))
        val foldUdf = strict match {
          case FunnelMode.StrictIncrease =>
            udf((evs: Seq[Row]) => foldStrictIncrease(evs, k, windowMicros))
          case FunnelMode.StrictOrder =>
            udf((evs: Seq[Row]) => foldStrictOrder(evs, windowMicros))
          case _ =>
            udf((evs: Seq[Row]) => foldStrictDedup(evs, k, windowMicros))
        }
        ev.groupBy(col(userCol))
          .agg(sort_array(collect_list(col("e"))).as("evs"))
          .select(col(userCol),
            foldUdf(col("evs")).cast("int").as("funnel_level"))
    }
  }

  private val NONE = Long.MinValue

  /** Strictly-increasing-timestamp chains. Exactness needs two-phase
    * state: a step event at time T may only extend chains whose last
    * event is STRICTLY earlier, i.e. the per-level best-start AS OF the
    * previous distinct timestamp — updates within one timestamp group
    * are staged and become visible when the clock advances. Within the
    * visible set, keep-max-start greedy is exact (every visible chain's
    * last event precedes T, so extension validity depends on the start
    * alone).
    */
  private def foldStrictIncrease(evs: Seq[Row], k: Int, window: Long): Int = {
    val visible = Array.fill(k + 1)(NONE)
    val staged = Array.fill(k + 1)(NONE)
    var curTs = NONE
    var maxLevel = 0
    evs.foreach { e =>
      val us = e.getLong(0)
      val t = e.getInt(2)
      if (us != curTs) {
        var j = 1
        while (j <= k) {
          if (staged(j) > visible(j)) visible(j) = staged(j)
          j += 1
        }
        curTs = us
      }
      if (t == 1) {
        if (us > staged(1)) staged(1) = us
        if (maxLevel < 1) maxLevel = 1
      } else if (t >= 2) {
        val p = visible(t - 1)
        if (p != NONE && us - p <= window) {
          if (p > staged(t)) staged(t) = p
          if (t > maxLevel) maxLevel = t
        }
      }
    }
    maxLevel
  }

  /** Consecutive-events chains: only a chain ending at the IMMEDIATELY
    * preceding event can be extended, so the whole state is that one
    * (level, start) pair plus the best level ever reached.
    */
  private def foldStrictOrder(evs: Seq[Row], window: Long): Int = {
    var prevLevel = 0
    var prevStart = 0L
    var maxLevel = 0
    evs.foreach { e =>
      val us = e.getLong(0)
      val t = e.getInt(2)
      if (t >= 2 && prevLevel == t - 1 && us - prevStart <= window) {
        prevLevel = t // chain start unchanged
      } else if (t == 1) {
        prevLevel = 1; prevStart = us
      } else {
        prevLevel = 0
      }
      if (prevLevel > maxLevel) maxLevel = prevLevel
    }
    maxLevel
  }

  /** No-repeated-condition chains: an event of condition t interrupts
    * every live chain that already holds condition t (levels ≥ t); kills
    * are uniform across a level (the current event postdates every live
    * chain's last event), so keep-max-start greedy stays exact.
    */
  private def foldStrictDedup(evs: Seq[Row], k: Int, window: Long): Int = {
    val levels = Array.fill(k + 1)(NONE)
    var maxLevel = 0
    evs.foreach { e =>
      val us = e.getLong(0)
      val t = e.getInt(2)
      val cand =
        if (t == 1) us
        else {
          val p = levels(t - 1)
          if (p != NONE && us - p <= window) p else NONE
        }
      var j = t
      while (j <= k) { levels(j) = NONE; j += 1 }
      if (cand != NONE) {
        levels(t) = cand
        if (t > maxLevel) maxLevel = t
      }
    }
    maxLevel
  }

  /** ClickHouse-style `sequenceCount` for a two-step pattern: per user,
    * the number of NON-OVERLAPPING `first → second` chains under greedy
    * earliest matching (each event used at most once) — the "how many
    * times did they convert" companion to [[windowFunnel]]'s "how deep
    * did they get".
    *
    * Greedy matching has a closed relational form — no fold needed. It
    * is bracket matching (`first` opens, `second` closes), and the
    * maximum number of matched pairs equals
    * `n_second − max(0, max over prefixes of (#second − #first))`: a
    * `second` goes unmatched exactly when closes exceed opens in some
    * prefix, and the worst prefix excess counts precisely the
    * unmatchable ones. One prefix-sum window + one aggregation, every
    * value an integer — the whole operator replays exactly in SQL.
    *
    * 100 TB shape: events filtered to the two step types BEFORE the
    * single per-user shuffle; one window pass + one aggregation, both
    * partitioned on the user key (no second shuffle — same key).
    * Output: (userCol, n_first, n_second, n_matched), one row per user
    * with ≥1 step event.
    */
  def sequencePairCount(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      first: String,
      second: String): DataFrame = {
    require(first != second, "sequencePairCount steps must differ")
    requireNoClash(userCol,
      Seq("__x", "n_first", "n_second", "n_matched"))
    import org.apache.spark.sql.expressions.Window
    val ev = df.filter(col(tsCol).isNotNull &&
      col(typeCol).isin(first, second))
    val upto = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(orderCol).cast("long"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("__x", sum(
        when(col(typeCol) === second, 1L).otherwise(-1L)).over(upto))
      .groupBy(col(userCol))
      .agg(
        sum(when(col(typeCol) === first, 1L).otherwise(0L)).as("n_first"),
        sum(when(col(typeCol) === second, 1L).otherwise(0L)).as("n_second"),
        (sum(when(col(typeCol) === second, 1L).otherwise(0L)) -
          greatest(max(col("__x")), lit(0L))).as("n_matched"))
  }

  /** Minimum time-to-conversion: per user, the smallest `second.ts −
    * first.ts` over valid `first → second` pairs within `windowMicros`
    * — the "how fast do converters convert" latency metric next to
    * [[windowFunnel]]'s depth and [[sequencePairCount]]'s volume.
    *
    * Efficient form: for each `second` event only its LATEST preceding
    * `first` matters (any older one gives a larger gap), which is one
    * ignore-nulls `last` window over the per-user sort — so the oracle's
    * O(n²) pair-join MIN collapses to a single window pass + one
    * aggregation on the same user key (one shuffle). Output:
    * (userCol, min_ttc_us BIGINT), rows only for users with a valid
    * pair.
    */
  def timeToConversion(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      first: String,
      second: String,
      windowMicros: Long): DataFrame = {
    require(first != second, "timeToConversion steps must differ")
    requireNoClash(userCol,
      Seq("__t", "__ord", "__us", "__lv", "min_ttc_us"))
    import org.apache.spark.sql.expressions.Window
    val ev = df.filter(col(tsCol).isNotNull &&
        col(typeCol).isin(first, second))
      .select(col(userCol), col(typeCol).as("__t"),
        unix_micros(col(tsCol)).as("__us"),
        col(orderCol).cast("long").as("__ord"))
    val before = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("__lv",
        last(when(col("__t") === first, col("__us")), ignoreNulls = true)
          .over(before))
      .filter(col("__t") === second && col("__lv").isNotNull &&
        (col("__us") - col("__lv")) <= windowMicros)
      .groupBy(col(userCol))
      .agg(min(col("__us") - col("__lv")).as("min_ttc_us"))
  }

  /** Multi-touch ATTRIBUTION — which channel gets credit for each
    * conversion, under the three standard models at once: FIRST-touch
    * (the channel of the earliest in-window touch), LAST-touch (the
    * latest), and LINEAR (credit split evenly across the conversion's
    * in-window touches). The marketing-analytics companion to
    * [[windowFunnel]]/[[timeToConversion]], computed in-engine so the
    * raw event stream stays out of the sink (the same argument as the
    * funnel family).
    *
    * Determinism contract: touches order by (ts, order-id); a touch
    * participates when it precedes the conversion in that order and
    * `conv_ts − touch_ts ≤ windowMicros`. Linear credit is an INTEGER
    * permille per touch row — `1000 div n_touches` — so sums are
    * shuffle-order-proof (a float 1/n sum is not); the flooring loses
    * ≤ (n−1)‰ per conversion, documented. Rows with NULL timestamps
    * drop (the [[windowFunnel]] contract).
    *
    * Output: one row per channel value:
    * `(channel, touches, first_touch_convs, last_touch_convs,
    * linear_credit_permille)` — all BIGINT.
    *
    * 100 TB shape: both sides filter to their event type BEFORE the
    * single per-user hash join; per-user cost is touches×convs, the
    * same per-key bound every sessionization pays (skewed mega-users →
    * AQE skew handling). The first/last/linear reads share ONE window
    * pass on the conversion key; the three per-channel rollups are
    * channel-cardinality-sized.
    */
  def attribution(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      channel: Column,
      touchType: String,
      convType: String,
      windowMicros: Long): DataFrame = {
    require(touchType != convType, "attribution steps must differ")
    requireNoClash(userCol, Seq("__tus", "__tord", "__ch", "__cus",
      "__cord", "__n", "__rf", "__rl", "channel", "touches",
      "first_touch_convs", "last_touch_convs", "linear_credit_permille"))
    import org.apache.spark.sql.expressions.Window
    val timed = df.filter(col(tsCol).isNotNull)
    val touches = timed.filter(col(typeCol) === touchType)
      .select(col(userCol), unix_micros(col(tsCol)).as("__tus"),
        col(orderCol).cast("long").as("__tord"), channel.as("__ch"))
    val convs = timed.filter(col(typeCol) === convType)
      .select(col(userCol), unix_micros(col(tsCol)).as("__cus"),
        col(orderCol).cast("long").as("__cord"))
    val j = touches.join(convs, userCol)
      .filter(
        (col("__tus") < col("__cus") ||
          (col("__tus") === col("__cus") && col("__tord") < col("__cord"))) &&
          (col("__cus") - col("__tus")) <= windowMicros)
    val convKey = Seq(col(userCol), col("__cus"), col("__cord"))
    val byConv = Window.partitionBy(convKey: _*)
    val asc = byConv.orderBy(col("__tus").asc, col("__tord").asc)
    val desc = byConv.orderBy(col("__tus").desc, col("__tord").desc)
    val ranked = j
      .withColumn("__n", count(lit(1)).over(byConv))
      .withColumn("__rf", row_number().over(asc))
      .withColumn("__rl", row_number().over(desc))
    // all three models read off the ONE ranked pass as conditional
    // sums — no separate rollups, no re-join
    ranked.groupBy(col("__ch"))
      .agg(
        count(lit(1)).as("touches"),
        sum(when(col("__rf") === 1, 1L).otherwise(0L))
          .as("first_touch_convs"),
        sum(when(col("__rl") === 1, 1L).otherwise(0L))
          .as("last_touch_convs"),
        sum(expr("1000 div __n")).as("linear_credit_permille"))
      .withColumnRenamed("__ch", "channel")
  }

  /** Cohort retention: users grouped by their first-activity day, with
    * counts of how many returned at each of `offsets` days later — the
    * release-dashboard companion to [[windowFunnel]].
    *
    * Cohort days are epoch-day BIGINTs, not raw DATEs (hash-stable
    * across engines — the repo's determinism convention). One per-user
    * aggregation (min day + distinct active days, bounded by the user's
    * distinct-day count) and one tiny per-cohort aggregation; both with
    * map-side partial agg, the second over one row per user. Rows with
    * a NULL timestamp are dropped (no day to cohort them into).
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
    requireNoClash(userCol,
      Seq("__day", "__d0", "__days") ++ offsets.map(o => s"__r$o"))
    val dayUs = 86400000000L
    val ev = df.filter(col(tsCol).isNotNull).select(col(userCol),
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
