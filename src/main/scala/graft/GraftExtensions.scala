package graft

import graft.functions.{SimHash32, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native functions for SQL
  * users (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT simhash32(token_hashes) FROM ...
  *
  * The DataFrame API reaches the same expressions without extensions via
  * [[graft.functions.VectorFunctions]] / [[graft.functions.SketchFunctions]].
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
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash32 takes exactly 1 argument")
        SimHash32(children.head)
      }))
  }
}
