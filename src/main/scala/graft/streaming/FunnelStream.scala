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

  final case class FunnelEvent(user: String, us: Long, ord: Long, t: Int)
  final case class FunnelState(starts: Array[Long], maxLevel: Int)
  final case class FunnelLevel(user: String, funnel_level: Int)
  final case class PairState(nSecond: Long, excess: Long, maxExcess: Long)
  final case class PairCount(user: String, n_matched: Long)

  private val NONE = Long.MinValue

  def windowFunnelStream(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMicros: Long,
      idleTimeout: Option[String] = None): Dataset[FunnelLevel] = {
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
    val ev = df
      .filter(col(tsCol).isNotNull && col(typeCol).isin(steps: _*))
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
              .getOrElse(FunnelState(Array.fill(k)(NONE), 0))
            val starts = st.starts.clone()
            var maxLevel = st.maxLevel
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              if (e.t == 1) {
                if (e.us > starts(0)) starts(0) = e.us
                if (maxLevel < 1) maxLevel = 1
              } else if (e.t >= 2) {
                val p = starts(e.t - 2)
                if (p != NONE && e.us - p <= windowMicros) {
                  if (p > starts(e.t - 1)) starts(e.t - 1) = p
                  if (e.t > maxLevel) maxLevel = e.t
                }
              }
            }
            state.update(FunnelState(starts, maxLevel))
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
            val st = state.getOption.getOrElse(PairState(0L, 0L, 0L))
            var (nSecond, excess, maxExcess) =
              (st.nSecond, st.excess, st.maxExcess)
            rows.toArray.sortBy(e => (e.us, e.ord)).foreach { e =>
              if (e.t == 2) { nSecond += 1; excess += 1 } else excess -= 1
              if (excess > maxExcess) maxExcess = excess
            }
            val next = PairState(nSecond, excess, maxExcess)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (matched(next) > matched(st))
              Iterator.single(PairCount(user, matched(next)))
            else Iterator.empty
          }
      }
  }
}
