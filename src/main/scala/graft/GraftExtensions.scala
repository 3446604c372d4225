package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native functions for SQL
  * users (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *
  * The DataFrame API reaches the same expressions without extensions via
  * [[graft.functions.VectorFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children.head, children(1))
      }))
  }
}
