package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.GraftFunctions

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide, no code
  * changes), in addition to the programmatic
  * [[graft.expressions.GraftFunctions.register]] that the operators call
  * defensively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
        builder))
    }
}
