package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Chr, Expression, ExpressionInfo, Upper}

/** SparkSessionExtensions entry point — register the graft dialect's
  * expression-level functions at session build time:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Only pure-Expression functions can inject here; the UDF-backed ones
  * (TO_CHAR, DISTANCE, JSON_VALUE, hop_windows) need a live session and
  * are added by [[GraftSession.configure]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, s"graft dialect function $name",
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("ucase"), info("ucase"),
      (es: Seq[Expression]) => Upper(es.head)))
    ext.injectFunction((FunctionIdentifier("chr"), info("chr"),
      (es: Seq[Expression]) => Chr(es.head)))
    // codegen'd vector dot product, exposed to SQL users too
    ext.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          graft.functions.GraftFunctions.wrongNumArgs("dot_product", 2, es.length)
        org.apache.spark.sql.graft.VectorExpressions.DotProduct(es(0), es(1))
      }))
    // binned range-join rewrite (opt-in: spark.graft.rangeJoin.binWidth)
    ext.injectOptimizerRule(graft.plans.RewriteRangeJoin(_))
  }
}
