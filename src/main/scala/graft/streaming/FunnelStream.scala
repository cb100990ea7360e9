package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING windowFunnel — the live companion to
  * [[graft.operators.EventFunnel.windowFunnel]]: per-user conversion
  * depth maintained across micro-batches with `flatMapGroupsWithState`,
  * emitting a row whenever a user's level INCREASES (update semantics —
  * the dashboard sees conversions as they happen instead of waiting for
  * a batch recompute).
  *
  * State per user is exactly the batch fold's accumulator — K chain-
  * start longs + the max level — NEVER the event history, so state is
  * O(K) per user regardless of traffic, and the greedy-is-exact
  * argument carries over per batch. Events are folded in event-time
  * order WITHIN each micro-batch; a late event that belongs before
  * already-folded history cannot retroactively rebuild a chain (set the
  * source watermark to the lateness you tolerate — the batch operator
  * over the full log is the reconciliation oracle, and the two agree
  * whenever each user's events arrive batch-monotonically, the normal
  * funnel deployment shape).
  *
  * `idleTimeout` (processing-time) evicts users idle longer than the
  * given duration — the dozer `Lifetime` analogue that keeps total
  * state bounded by ACTIVE users, not all users ever seen.
  */
object FunnelStream {

  import graft.operators.EventFunnel.FunnelMode

  final case class FunnelEvent(user: String, us: Long, ord: Long, t: Int)
  /** Per-user carry state for every mode, encoded as one long array:
    * Default → K chain starts; StrictIncrease → visible(K) ++ staged(K)
    * ++ curTs; StrictOrder → (prevLevel, prevStart); StrictDedup → K
    * live-chain starts. Always O(K).
    */
  final case class FunnelState(acc: Array[Long], maxLevel: Int)
  final case class FunnelLevel(user: String, funnel_level: Int)
  final case class PairState(nFirst: Long, nSecond: Long, excess: Long,
      maxExcess: Long)
  /** Full batch-shape emission: (user, n_first, n_second, n_matched) —
    * the [[graft.operators.EventFunnel.sequencePairCount]] row, re-sent
    * whenever any count moves (so the dialect's streaming SEQUENCE_COUNT
    * has column parity with batch).
    */
  final case class PairCount(user: String, n_first: Long, n_second: Long,
      n_matched: Long)

  private val NONE = Long.MinValue

  private def initState(k: Int, mode: FunnelMode): Array[Long] = mode match {
    case FunnelMode.StrictIncrease =>
      Array.fill(2 * k)(NONE) :+ NONE // visible ++ staged ++ curTs
    case FunnelMode.StrictOrder => Array(0L, 0L) // prevLevel, prevStart
    case _ => Array.fill(k)(NONE)
  }

  /** One event through the mode's fold; returns the updated max level.
    * Each body is the batch operator's fold with the accumulator lifted
    * into the carry array, so a streamed in-order feed lands on the
    * same levels as a batch recompute.
    */
  private def step(acc: Array[Long], maxLevel0: Int, k: Int,
      window: Long, mode: FunnelMode, us: Long, t: Int): Int = {
    var maxLevel = maxLevel0
    mode match {
      case FunnelMode.StrictIncrease =>
        // acc = visible(0..k-1) ++ staged(k..2k-1) ++ curTs(2k)
        if (us != acc(2 * k)) {
          var j = 0
          while (j < k) {
            if (acc(k + j) > acc(j)) acc(j) = acc(k + j)
            j += 1
          }
          acc(2 * k) = us
        }
        if (t == 1) {
          if (us > acc(k)) acc(k) = us
          if (maxLevel < 1) maxLevel = 1
        } else if (t >= 2) {
          val p = acc(t - 2)
          if (p != NONE && us - p <= window) {
            if (p > acc(k + t - 1)) acc(k + t - 1) = p
            if (t > maxLevel) maxLevel = t
          }
        }
      case FunnelMode.StrictOrder =>
        val prevLevel = acc(0).toInt; val prevStart = acc(1)
        if (t >= 2 && prevLevel == t - 1 && us - prevStart <= window) {
          acc(0) = t.toLong // start unchanged
        } else if (t == 1) { acc(0) = 1L; acc(1) = us }
        else { acc(0) = 0L }
        if (acc(0).toInt > maxLevel) maxLevel = acc(0).toInt
      case FunnelMode.StrictDedup =>
        val cand =
          if (t == 1) us
          else {
            val p = acc(t - 2)
            if (p != NONE && us - p <= window) p else NONE
          }
        var j = t - 1
        while (j < k) { acc(j) = NONE; j += 1 }
        if (cand != NONE) {
          acc(t - 1) = cand
          if (t > maxLevel) maxLevel = t
        }
      case _ => // Default greedy
        if (t == 1) {
          if (us > acc(0)) acc(0) = us
          if (maxLevel < 1) maxLevel = 1
        } else if (t >= 2) {
          val p = acc(t - 2)
          if (p != NONE && us - p <= window) {
            if (p > acc(t - 1)) acc(t - 1) = p
            if (t > maxLevel) maxLevel = t
          }
        }
    }
    maxLevel
  }

  def windowFunnelStream(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMicros: Long,
      idleTimeout: Option[String] = None,
      mode: FunnelMode = FunnelMode.Default): Dataset[FunnelLevel] = {
    require(steps.nonEmpty, "windowFunnelStream needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val tIdx = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelLevel]
    implicit val strEnc = Encoders.STRING
    // StrictOrder semantics need every event; other modes push the
    // step-type filter below the shuffle (the batch operator's shape)
    val typed = df.filter(col(tsCol).isNotNull)
    val base = mode match {
      case FunnelMode.StrictOrder => typed
      case _ => typed.filter(col(typeCol).isin(steps: _*))
    }
    val ev = base
      .select(col(userCol).cast("string").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(orderCol).cast("long").as("ord"),
        tIdx.as("t"))
      .as[FunnelEvent]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ev.groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Update, timeout) {
        (user: String, rows: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption
              .getOrElse(FunnelState(initState(k, mode), 0))
            val acc = st.acc.clone()
            var maxLevel = st.maxLevel
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              maxLevel = step(acc, maxLevel, k, windowMicros, mode, e.us, e.t)
            }
            state.update(FunnelState(acc, maxLevel))
            idleTimeout.foreach(state.setTimeoutDuration)
            if (maxLevel > st.maxLevel) Iterator.single(FunnelLevel(user, maxLevel))
            else Iterator.empty
          }
      }
  }

  /** STREAMING sequenceCount — the live twin of
    * [[graft.operators.EventFunnel.sequencePairCount]]: per-user count
    * of non-overlapping `first → second` pairs, re-emitted whenever it
    * grows. The bracket-matching identity is a running fold, so state
    * is THREE longs per user (seconds seen, running excess, worst
    * excess) — `n_matched = nSecond − max(maxExcess, 0)` at any point.
    * Same in-order-arrival contract as [[windowFunnelStream]]; the
    * batch operator over the full log is the reconciliation oracle.
    */
  def sequencePairCountStream(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      first: String,
      second: String,
      idleTimeout: Option[String] = None): Dataset[PairCount] = {
    require(first != second, "sequencePairCountStream steps must differ")
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[PairState]
    implicit val outEnc = Encoders.product[PairCount]
    implicit val strEnc = Encoders.STRING
    val ev = df
      .filter(col(tsCol).isNotNull && col(typeCol).isin(first, second))
      .select(col(userCol).cast("string").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(orderCol).cast("long").as("ord"),
        when(col(typeCol) === second, 2).otherwise(1).as("t"))
      .as[FunnelEvent]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    def matched(s: PairState): Long = s.nSecond - math.max(s.maxExcess, 0L)
    ev.groupByKey(_.user)
      .flatMapGroupsWithState[PairState, PairCount](
        OutputMode.Update, timeout) {
        (user: String, rows: Iterator[FunnelEvent],
            state: GroupState[PairState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(PairState(0L, 0L, 0L, 0L))
            var (nFirst, nSecond, excess, maxExcess) =
              (st.nFirst, st.nSecond, st.excess, st.maxExcess)
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              if (e.t == 2) { nSecond += 1; excess += 1 }
              else { nFirst += 1; excess -= 1 }
              if (excess > maxExcess) maxExcess = excess
            }
            val next = PairState(nFirst, nSecond, excess, maxExcess)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (next != st)
              Iterator.single(
                PairCount(user, nFirst, nSecond, matched(next)))
            else Iterator.empty
          }
      }
  }

  final case class TtcState(lastFirstUs: Long, minGap: Long)
  final case class Ttc(user: String, min_ttc_us: Long)

  /** STREAMING minimum time-to-conversion — the live twin of
    * [[graft.operators.EventFunnel.timeToConversion]]: two longs of
    * state per user (the latest first-event time and the running
    * minimum gap), re-emitting (user, min_ttc_us) whenever the minimum
    * improves. In-order arrival reproduces the batch table exactly
    * (only the LATEST preceding first event matters — the same
    * dominance argument as the batch window form).
    */
  def timeToConversionStream(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      first: String,
      second: String,
      windowMicros: Long,
      idleTimeout: Option[String] = None): Dataset[Ttc] = {
    require(first != second, "timeToConversionStream steps must differ")
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[TtcState]
    implicit val outEnc = Encoders.product[Ttc]
    implicit val strEnc = Encoders.STRING
    val ev = df
      .filter(col(tsCol).isNotNull && col(typeCol).isin(first, second))
      .select(col(userCol).cast("string").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(orderCol).cast("long").as("ord"),
        when(col(typeCol) === second, 2).otherwise(1).as("t"))
      .as[FunnelEvent]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ev.groupByKey(_.user)
      .flatMapGroupsWithState[TtcState, Ttc](OutputMode.Update, timeout) {
        (user: String, rows: Iterator[FunnelEvent],
            state: GroupState[TtcState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(TtcState(NONE, NONE))
            var lastFirst = st.lastFirstUs
            var minGap = st.minGap
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              if (e.t == 1) lastFirst = e.us
              else if (lastFirst != NONE) {
                val gap = e.us - lastFirst
                if (gap <= windowMicros &&
                    (minGap == NONE || gap < minGap)) minGap = gap
              }
            }
            state.update(TtcState(lastFirst, minGap))
            idleTimeout.foreach(state.setTimeoutDuration)
            if (minGap != NONE && minGap != st.minGap)
              Iterator.single(Ttc(user, minGap))
            else Iterator.empty
          }
      }
  }

  /** One emitted row per (conversion, credited touch): the streaming
    * unit of [[graft.operators.EventFunnel.attribution]]. `is_first` /
    * `is_last` mark the first-/last-touch model's pick;
    * `credit_permille` is the linear model's integer share
    * (`1000 div n_touches`). Downstream per-channel rollups (a
    * groupBy in the same streaming query, or a batch read of the sink)
    * reproduce the batch operator's table exactly.
    */
  final case class TouchCredit(user: String, conv_us: Long, conv_ord: Long,
      channel: String, n_touches: Long, is_first: Boolean,
      is_last: Boolean, credit_permille: Long)

  final case class AttribEvent(user: String, us: Long, ord: Long,
      isConv: Boolean, ch: String)

  /** STREAMING multi-touch attribution — the live twin of
    * [[graft.operators.EventFunnel.attribution]]: per-user state is the
    * WINDOW-BOUNDED touch buffer (touches older than `windowMicros`
    * behind the newest event seen can never credit a future conversion
    * and are pruned — state is O(in-window touches), never O(history)).
    * Each conversion emits its credited touches at arrival.
    *
    * Contract (the stream-twin convention of this file): events
    * arriving in (ts, order-id) order produce EXACTLY the batch
    * operator's attribution — StreamingSpec aggregates the emissions
    * and asserts equality; a touch arriving after a conversion it
    * should have credited is missed (the documented at-arrival
    * semantics; feed watermark-ordered input for exact parity).
    */
  def attributionStream(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      channelCol: String,
      touchType: String,
      convType: String,
      windowMicros: Long,
      idleTimeout: Option[String] = None): Dataset[TouchCredit] = {
    require(touchType != convType, "attribution steps must differ")
    implicit val evEnc = Encoders.product[AttribEvent]
    implicit val stEnc = Encoders.kryo[Array[(Long, Long, String)]]
    implicit val outEnc = Encoders.product[TouchCredit]
    implicit val strEnc = Encoders.STRING
    val ev = df.filter(col(tsCol).isNotNull &&
        col(typeCol).isin(touchType, convType))
      .select(col(userCol).cast("string").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(orderCol).cast("long").as("ord"),
        (col(typeCol) === convType).as("isConv"),
        coalesce(col(channelCol).cast("string"), lit("")).as("ch"))
      .as[AttribEvent]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ev.groupByKey(_.user)
      .flatMapGroupsWithState[Array[(Long, Long, String)], TouchCredit](
        OutputMode.Update, timeout) {
        (user: String, rows: Iterator[AttribEvent],
            state: GroupState[Array[(Long, Long, String)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf = state.getOption
              .map(_.toVector).getOrElse(Vector.empty)
            val out = scala.collection.mutable.ArrayBuffer.empty[TouchCredit]
            var maxUs = buf.lastOption.map(_._1).getOrElse(Long.MinValue)
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              if (e.us > maxUs) maxUs = e.us
              if (!e.isConv) buf :+= ((e.us, e.ord, e.ch))
              else {
                // qualifying touches are a SUFFIX of the (us, ord)-
                // ordered buffer (all entries precede the conversion in
                // walk order; the window cut is on ascending us)
                val qual = buf.dropWhile(t => e.us - t._1 > windowMicros)
                if (qual.nonEmpty) {
                  val n = qual.size.toLong
                  qual.zipWithIndex.foreach { case ((_, _, ch), i) =>
                    out += TouchCredit(user, e.us, e.ord, ch, n,
                      is_first = i == 0, is_last = i == qual.size - 1,
                      credit_permille = 1000L / n)
                  }
                }
              }
            }
            // prune: older than window behind the newest event can
            // never credit a future conversion
            val pruned = buf.dropWhile(t => maxUs - t._1 > windowMicros)
            state.update(pruned.toArray)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
