package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.DotProduct

/** SparkSessionExtensions entry point: registers graft's native
  * expressions so SQL users get them too
  * (`--conf spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
  }
}

object GraftFunctions {
  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(args.head, args(1))
  }

  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      build)

  /** Idempotent per-session registration, for sessions created without
    * the extensions conf (e.g. the driver's own harness session).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", build, "built-in")

  /** graft_dot as a Column for the DataFrame DSL (routes through the
    * registry so both DSL and SQL share one implementation).
    */
  def dotCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }
}
