package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the reference serves per-endpoint
  * ingest/latency metrics from its orchestrator (dozer-cli progress +
  * dozer-api metrics endpoints); Spark's `StreamingQueryListener` is
  * the native analogue. One listener per session aggregates the latest
  * progress snapshot per query name, so an operator (or test) can ask
  * "what is this pipeline's current rows/sec and batch duration"
  * without scraping logs.
  */
object StreamMetrics {

  /** One stateful operator's state-store footprint within a query. */
  final case class OperatorState(
      operator: String,
      rowsTotal: Long,
      memoryBytes: Long,
      rowsUpdated: Long,
      rowsRemoved: Long)

  /** Latest-progress snapshot of one streaming query. */
  final case class Snapshot(
      name: String,
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      stateRowsTotal: Long,
      stateMemoryBytes: Long = 0L,
      /** Event-time watermark as epoch millis; None until one is set. */
      watermarkMs: Option[Long] = None,
      /** Per-stateful-operator breakdown (aggregation, dedup, join …). */
      operators: Seq[OperatorState] = Nil)

  final class Recorder extends StreamingQueryListener {
    private val latest = new ConcurrentHashMap[String, Snapshot]()
    private val inputTotals = new ConcurrentHashMap[String, java.lang.Long]()
    private val batchTotals = new ConcurrentHashMap[String, java.lang.Long]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val stateRows = p.stateOperators.map(_.numRowsTotal).sum
      // per-operator state breakdown: rows + memory + churn per
      // stateful operator (reference telemetry publishes per-entity
      // labels the same way — dozer-tracing/src/constants.rs TABLE/
      // CONNECTION labels); operator names fall back to their index
      // when Spark reports none
      val ops = p.stateOperators.toSeq.zipWithIndex.map { case (so, i) =>
        OperatorState(
          operator = Option(so.operatorName).filter(_.nonEmpty)
            .getOrElse(s"op$i"),
          rowsTotal = so.numRowsTotal,
          memoryBytes = so.memoryUsedBytes,
          rowsUpdated = so.numRowsUpdated,
          rowsRemoved = so.numRowsRemoved)
      }
      // event-time watermark (ISO-8601 in the progress map) → epoch ms;
      // absent or unparseable → None (batch-0 / no-watermark queries)
      val wm = Option(p.eventTime.get("watermark")).flatMap { s =>
        try Some(java.time.Instant.parse(s).toEpochMilli)
        catch { case _: Exception => None }
      }.filter(_ > 0L)
      // cumulative counters feed the Prometheus endpoint (a counter must
      // be monotone across scrapes; the latest-snapshot gauge is not)
      inputTotals.merge(name, p.numInputRows, (a, b) => a + b)
      batchTotals.merge(name, 1L, (a, b) => a + b)
      latest.put(name, Snapshot(
        name = name,
        batchId = p.batchId,
        numInputRows = p.numInputRows,
        inputRowsPerSecond =
          if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond,
        processedRowsPerSecond =
          if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
        batchDurationMs = p.batchDuration,
        stateRowsTotal = stateRows,
        stateMemoryBytes = p.stateOperators.map(_.memoryUsedBytes).sum,
        watermarkMs = wm,
        operators = ops))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    /** Latest snapshot for a query name, if any progress was seen. */
    def snapshot(name: String): Option[Snapshot] = Option(latest.get(name))

    /** All queries' latest snapshots. */
    def all(): Map[String, Snapshot] = {
      import scala.jdk.CollectionConverters._
      latest.asScala.toMap
    }

    /** Cumulative input rows per query since this recorder attached. */
    def inputRowsTotal(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      inputTotals.asScala.map { case (k, v) => k -> v.longValue }.toMap
    }

    /** Cumulative micro-batch count per query. */
    def batchesTotal(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      batchTotals.asScala.map { case (k, v) => k -> v.longValue }.toMap
    }
  }

  /** Attach a recorder to the session's streams; returns it for
    * querying. Call `spark.streams.removeListener` with it when done.
    */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.streams.addListener(r)
    r
  }
}
