package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed-state operators via `GroupState` — the extension point
  * that replaces dozer's hand-built per-key processor state
  * (`HashMap<RecordKey, AggregationState>`,
  * dozer-sql/src/aggregation/processor.rs:58) when no built-in
  * aggregation fits. State lives in Spark's state store (checkpointed,
  * partitioned by key — RocksDB-backed on a real cluster), with
  * event-time timeouts standing in for dozer's per-record `Lifetime`.
  */
object StatefulOps {

  case class KeyedCount(key: String, n: Long)

  /** Running per-key event count across microbatches (update mode).
    * `ttl` (processing-time timeout) drops idle keys — bounded state.
    */
  def runningCounts(keyed: Dataset[String], ttlMs: Long = -1L): Dataset[KeyedCount] = {
    implicit val outEnc = Encoders.product[KeyedCount]
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    keyed.groupByKey(identity)
      .mapGroupsWithState[Long, KeyedCount](
        if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            KeyedCount(key, n)
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            KeyedCount(key, n)
          }
      }
  }
}
