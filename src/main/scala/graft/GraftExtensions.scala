package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.NormalizeIp

/** SparkSessionExtensions hook: registers the engine's native
  * expressions so they are usable from SQL text as well as the Column
  * API. Attach with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val info = new ExpressionInfo(classOf[NormalizeIp].getName, "normalize_ip")
    val builder: FunctionBuilder = (children: Seq[Expression]) => {
      require(children.size == 1, "normalize_ip takes one argument")
      NormalizeIp(children.head)
    }
    ext.injectFunction((FunctionIdentifier("normalize_ip"), info, builder))
  }
}
