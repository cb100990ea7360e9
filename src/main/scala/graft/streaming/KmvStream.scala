package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING KMV distinct counting — the live twin of
  * [[graft.operators.Kmv]]: per-segment approximate distinct counts
  * maintained across micro-batches with `mapGroupsWithState`. State per
  * segment is the sketch itself — the k smallest hashes, a sorted
  * O(k) array — so a segment's state never grows with its traffic or
  * cardinality, exactly the property that makes sketches the right
  * shape for unbounded streams (an exact streaming COUNT DISTINCT
  * holds every key ever seen).
  *
  * Each micro-batch merges its new hashes into the sketch (sorted
  * merge + truncate — the same union rule as the batch operator) and
  * emits the segment's refreshed estimate. Uses the same finalized
  * GF(2^61−1) hash family as [[graft.operators.Kmv]], so a streaming
  * sketch and a batch sketch over the same data are IDENTICAL arrays —
  * batch recompute is the reconciliation oracle, bit for bit.
  */
object KmvStream {

  final case class KmvEstimate(segment: String, n_kmv: Int,
      est_distinct: Double)

  def distinctEstimates(
      df: DataFrame,
      segmentCol: String,
      keyCol: String,
      k: Int,
      idleTimeout: Option[String] = None): Dataset[KmvEstimate] = {
    require(k >= 2, s"k=$k: a KMV sketch needs at least 2 slots")
    implicit val inEnc = Encoders.product[(String, Long)]
    implicit val stEnc = Encoders.kryo[Array[Long]]
    implicit val outEnc = Encoders.product[KmvEstimate]
    implicit val strEnc = Encoders.STRING
    val hashed = df
      .select(col(segmentCol).cast("string").as("segment"),
        graft.operators.Kmv.hash61(col(keyCol)).as("h"))
      .filter(col("h").isNotNull)
      .as[(String, Long)]
    val timeout =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    hashed.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvEstimate](timeout) {
        (seg: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(Array.empty[Long])
            state.remove()
            KmvEstimate(seg, st.length,
              graft.operators.Kmv.estimateValue(st, k))
          } else {
            val st = state.getOption.getOrElse(Array.empty[Long])
            val merged = (st.iterator ++ rows.map(_._2))
              .toArray.distinct.sorted.take(k)
            state.update(merged)
            idleTimeout.foreach(state.setTimeoutDuration)
            KmvEstimate(seg, merged.length,
              graft.operators.Kmv.estimateValue(merged, k))
          }
      }
  }
}
