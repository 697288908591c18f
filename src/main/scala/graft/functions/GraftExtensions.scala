package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions with the Catalyst function
  * registry, both as a [[SparkSessionExtensions]] injector (for
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and as an
  * imperative helper for an already-running session. Registered functions
  * are callable from SQL (`SELECT graft_dot(a, b)`) and via
  * `call_function("graft_dot", ...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injected.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RawTimePushdown)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  private val injected: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - left-to-right double dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes 2 arguments")
        DotProduct(args.head, args(1))
      }))

  /** Imperative registration into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (ident, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, i, builder)
    }
}
