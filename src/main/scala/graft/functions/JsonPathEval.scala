package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal JSONPath evaluator for JSON_VALUE / JSON_QUERY parity.
  *
  * Dozer routes these through its own jsonpath engine (reference:
  * dozer-sql/jsonpath/, wired in expression/src/json_functions.rs:44-118):
  * JSON_VALUE returns a scalar (null when the path lands on an
  * object/array), JSON_QUERY returns the serialized node. The supported
  * path subset here: `$`, `.field`, `['field']`, `[index]`.
  *
  * Built on the Jackson shipped inside Spark — no extra dependency.
  */
object JsonPathEval {
  private val mapper = new ObjectMapper()

  private[functions] def select(json: String, path: String): Option[JsonNode] = {
    if (json == null || path == null) return None
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return None }
    var node: JsonNode = root
    var i = 0
    val p = path.trim
    if (p.isEmpty || p.charAt(0) != '$') return None
    i = 1
    while (i < p.length && node != null) {
      p.charAt(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
          node = node.get(p.substring(start, j))
          i = j
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) return None
          val inner = p.substring(i + 1, end).trim
          if ((inner.startsWith("'") && inner.endsWith("'")) ||
              (inner.startsWith("\"") && inner.endsWith("\""))) {
            node = node.get(inner.substring(1, inner.length - 1))
          } else {
            try node = node.get(inner.toInt)
            catch { case _: NumberFormatException => return None }
          }
          i = end + 1
        case _ => return None
      }
    }
    Option(node)
  }

  /** Scalar extraction: strings unquoted, numbers/bools as text, else null. */
  def value(json: String, path: String): String =
    select(json, path) match {
      case Some(n) if n.isValueNode && !n.isNull => n.asText()
      case _                                     => null
    }

  /** Structural extraction: the node serialized as JSON text. */
  def query(json: String, path: String): String =
    select(json, path) match {
      case Some(n) if !n.isNull => n.toString
      case _                    => null
    }
}
