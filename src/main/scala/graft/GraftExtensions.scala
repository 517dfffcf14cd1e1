package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{GraftFunctions, LongDotProduct, RollingFingerprint, TopKByScore, VectorSumLong}

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
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.RollingFp),
      new ExpressionInfo(classOf[RollingFingerprint].getName, GraftFunctions.RollingFp),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.TopK),
      new ExpressionInfo(classOf[TopKByScore].getName, GraftFunctions.TopK),
      (exprs: Seq[Expression]) => TopKByScore(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
  }
}
