package org.apache.spark.sql.graft

/** Bridge to `private[sql]` streaming-state internals: a local-mode JVM
  * that ran a streaming query keeps its state-store providers loaded
  * (plus a maintenance thread touching them) until another query for
  * the same checkpoint unloads them. Long-lived processes that
  * interleave streaming rigs with batch work (the bench harness)
  * unload explicitly so later work isn't taxed by dead state.
  */
object StreamingStateBridge {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
