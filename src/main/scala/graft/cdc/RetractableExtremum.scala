package graft.cdc

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Retractable MIN/MAX: the multiset-buffer aggregator dozer uses so a
  * Delete can re-derive the extremum (reference:
  * dozer-sql/src/aggregation/aggregator.rs:64-106 — `BTreeMap<value,
  * count>` per group; min.rs / max.rs).
  *
  * Spark's native min/max can't retract, so this is a typed
  * `Aggregator[(value, weight), Map[value,count], Option[value]]`:
  * +1 inserts, -1 deletes; finish() scans surviving values. Map-side
  * partial aggregation still applies (buffers merge associatively), so
  * the shuffle carries one multiset per group per partition — at scale
  * the buffer stays proportional to per-group distinct values, the same
  * bound dozer's BTreeMap has.
  *
  * The plain `*_APPEND_ONLY` variants (min_append_only.rs) are just
  * Spark's built-in min/max — no custom code needed.
  */
abstract class RetractableExtremum(isMin: Boolean)
    extends Aggregator[(Double, Long), Map[Double, Long], Option[Double]] {

  def zero: Map[Double, Long] = Map.empty

  def reduce(buf: Map[Double, Long], in: (Double, Long)): Map[Double, Long] =
    bump(buf, in._1, in._2)

  def merge(a: Map[Double, Long], b: Map[Double, Long]): Map[Double, Long] =
    b.foldLeft(a) { case (acc, (v, c)) => bump(acc, v, c) }

  private def bump(buf: Map[Double, Long], v: Double, c: Long): Map[Double, Long] = {
    val next = buf.getOrElse(v, 0L) + c
    if (next == 0L) buf - v else buf.updated(v, next)
  }

  def finish(buf: Map[Double, Long]): Option[Double] = {
    val alive = buf.collect { case (v, c) if c > 0 => v }
    if (alive.isEmpty) None
    else Some(if (isMin) alive.min else alive.max)
  }

  def bufferEncoder: Encoder[Map[Double, Long]] = Encoders.kryo[Map[Double, Long]]

  def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
}

object RetractableExtremum {
  import org.apache.spark.sql.functions.udaf
  import org.apache.spark.sql.expressions.UserDefinedFunction

  private object MinAgg extends RetractableExtremum(isMin = true)
  private object MaxAgg extends RetractableExtremum(isMin = false)

  lazy val retractMin: UserDefinedFunction = udaf(MinAgg)
  lazy val retractMax: UserDefinedFunction = udaf(MaxAgg)
}
