package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NormalizeIp, SortedIntersectSize, VecCosine, VecDot}

/** SparkSessionExtensions hook: registers the engine's native
  * expressions so they are usable from SQL text as well as the Column
  * API. Attach with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def unary(name: String, clazz: Class[_], mk: Expression => Expression): Unit = {
      val builder: FunctionBuilder = { children =>
        require(children.size == 1, s"$name takes one argument")
        mk(children.head)
      }
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    def binary(name: String, clazz: Class[_],
        mk: (Expression, Expression) => Expression): Unit = {
      val builder: FunctionBuilder = { children =>
        require(children.size == 2, s"$name takes two arguments")
        mk(children.head, children(1))
      }
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    unary("normalize_ip", classOf[NormalizeIp], NormalizeIp(_))
    binary("vec_dot", classOf[VecDot], VecDot(_, _))
    binary("vec_cosine", classOf[VecCosine], VecCosine(_, _))
    binary("sorted_intersect_size", classOf[SortedIntersectSize],
      SortedIntersectSize(_, _))
  }
}
