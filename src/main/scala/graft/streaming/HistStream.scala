package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** STREAMING log-linear histogram quantiles — the live twin of
  * [[graft.operators.Sketches.logHistQuantiles]]: per-group p50/p90/…
  * maintained across micro-batches with `flatMapGroupsWithState`.
  * State per group is the histogram itself — a bucket→count map
  * bounded at O(64·2^bits) entries — so state never grows with
  * traffic, the property that makes the sketch the right shape for an
  * unbounded stream (exact streaming quantiles would hold every value
  * ever seen).
  *
  * Each micro-batch adds its values' bucket counts (the additive merge
  * [[graft.operators.Sketches.logHistogram]]'s shard law proves) and
  * re-emits the group's refreshed quantile rows. The bucket mapping is
  * the same integer arithmetic as the batch operator, so a streaming
  * histogram and a batch histogram over the same data are IDENTICAL
  * maps — batch recompute is the reconciliation oracle, bucket for
  * bucket (StreamingSpec asserts equality).
  */
object HistStream {

  final case class HistQuantile(group: String, q_pct: Int, est_lo: Long,
      n_total: Long)

  /** Scala twin of [[graft.operators.Sketches.logBucketLo]] — MUST
    * stay formula-identical (spec-pinned through the stream/batch
    * equality assertion).
    */
  private[streaming] def bucketLo(v: Long, bits: Int): Long =
    if (v <= 0L) 0L
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = math.max(e - bits, 0)
      v - v % (1L << shift)
    }

  def quantileEstimates(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bits: Int = 5,
      qPcts: Seq[Int] = Seq(50, 90, 99),
      idleTimeout: Option[String] = None): Dataset[HistQuantile] = {
    require(bits >= 1 && bits <= 20, s"bits=$bits out of range")
    require(qPcts.nonEmpty && qPcts.forall(p => p >= 1 && p <= 100),
      s"quantile percents must be in [1,100]: $qPcts")
    implicit val inEnc = Encoders.product[(String, Long)]
    implicit val stEnc = Encoders.kryo[Map[Long, Long]]
    implicit val outEnc = Encoders.product[HistQuantile]
    implicit val strEnc = Encoders.STRING
    val vals = df
      .select(col(groupCol).cast("string").as("group"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0L)
      .as[(String, Long)]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    vals.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], HistQuantile](
        org.apache.spark.sql.streaming.OutputMode.Update(), timeout) {
        (grp: String, rows: Iterator[(String, Long)],
            state: GroupState[Map[Long, Long]]) =>
          def quantiles(h: Map[Long, Long]): Iterator[HistQuantile] = {
            val total = h.values.sum
            if (total == 0L) Iterator.empty
            else {
              val sorted = h.toSeq.sortBy(_._1)
              qPcts.iterator.map { p =>
                var cum = 0L
                var est = sorted.last._1
                var found = false
                sorted.foreach { case (lo, n) =>
                  if (!found) {
                    cum += n
                    // cum ≥ ceil(p·total/100) — the batch rank rule
                    if (cum * 100L >= p.toLong * total) {
                      est = lo; found = true
                    }
                  }
                }
                HistQuantile(grp, p, est, total)
              }
            }
          }
          if (state.hasTimedOut) {
            val h = state.getOption.getOrElse(Map.empty[Long, Long])
            state.remove()
            quantiles(h)
          } else {
            var h = state.getOption.getOrElse(Map.empty[Long, Long])
            rows.foreach { case (_, v) =>
              val lo = bucketLo(v, bits)
              h = h.updated(lo, h.getOrElse(lo, 0L) + 1L)
            }
            state.update(h)
            idleTimeout.foreach(state.setTimeoutDuration)
            quantiles(h)
          }
      }
  }
}
