package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions as SQL
  * functions (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * This is the SparkSessionExtensions tier of the custom-operator
  * ladder (SURVEY.md §7.3): users of the SQL surface get
  * `iso_duration_seconds(col)` with full codegen, no UDF registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("iso_duration_seconds"),
      new ExpressionInfo(classOf[IsoDurationSecondsExpr].getName,
        "iso_duration_seconds"),
      (children: Seq[Expression]) => IsoDurationSecondsExpr(children.head)))
}
