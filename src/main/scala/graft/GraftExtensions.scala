package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatVecDot

/** Library-level Catalyst integration: enable with
  *   spark.sql.extensions=graft.GraftExtensions
  * (or SparkSession.builder.withExtensions(new GraftExtensions)) and
  * `vec_dot` is available in SQL/DataFrame code in every session —
  * no per-session registry mutation. The injection point is where a
  * custom Rule[LogicalPlan]/SparkStrategy would also be added if an
  * operator ever needs one (SURVEY §4 found none are required for
  * parity).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVecDot(exprs.head, exprs(1))
      }))
  }
}
