package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{GraftFunctions, LongDotProduct, VectorSumLong}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide, no code
  * changes), in addition to the programmatic
  * [[graft.expressions.GraftFunctions.register]] that the operators call
  * defensively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotQ),
      new ExpressionInfo(classOf[LongDotProduct].getName, GraftFunctions.DotQ),
      (exprs: Seq[Expression]) => LongDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.VecSum),
      new ExpressionInfo(classOf[VectorSumLong].getName, GraftFunctions.VecSum),
      (exprs: Seq[Expression]) => VectorSumLong(exprs.head).toAggregateExpression()))
  }
}
