package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` API-agnostic (a ColumnNode wrapper); the
  * catalyst Expression behind one is only reachable through the
  * private[sql] classic bridge. This shim re-exports the conversion for
  * graft's driver-side predicate analysis (iceberg partition pruning).
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Flatten a Column's AND-tree into the simple conjuncts driver-side
    * partition pruning understands: (attribute name, operator, literal
    * value). Operators: `=`, `<`, `<=`, `>`, `>=`, `null`, `notnull` —
    * always normalized to attribute-on-the-left. Anything else is
    * skipped (callers treat unextractable conjuncts as non-pruning).
    * Literal values arrive as the raw Scala values the user passed
    * (java.sql.Date, Long, String, …).
    */
  def simpleConjuncts(c: Column): Seq[(String, String, Any)] = {
    import org.apache.spark.sql.internal._
    def flat(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName == "and" =>
        f.arguments.flatMap(flat)
      case other => Seq(other)
    }
    def attr(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
      case _ => None
    }
    val flipped = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=")
    flat(c.node).flatMap {
      case f: UnresolvedFunction =>
        (f.functionName, f.arguments) match {
          case (op @ ("=" | "<" | "<=" | ">" | ">="),
              Seq(a, l: Literal)) if attr(a).isDefined =>
            Some((attr(a).get, op, l.value))
          case (op @ ("=" | "<" | "<=" | ">" | ">="),
              Seq(l: Literal, a)) if attr(a).isDefined =>
            Some((attr(a).get, if (op == "=") "=" else flipped(op), l.value))
          // Column.isNull/.isNotNull emit camelCase function names;
          // SQL-path isnull()/isnotnull() arrive lowercase — match both
          case (op, Seq(a)) if op.equalsIgnoreCase("isnull") &&
              attr(a).isDefined =>
            Some((attr(a).get, "null", null))
          case (op, Seq(a)) if op.equalsIgnoreCase("isnotnull") &&
              attr(a).isDefined =>
            Some((attr(a).get, "notnull", null))
          case _ => None
        }
      case _ => None
    }
  }
}
