package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extension registering the engine's native expressions as SQL
 * functions, so `spark.sql("SELECT dot_product_q(a, b) ...")` works in
 * templated SQL files too (not just the Column API). Install with
 * `spark.sql.extensions=graft.plans.GraftExtensions` or
 * `GraftSession.builder` (which sets it).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_product_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product_q(arrayA, arrayB)")
        DotProductQ(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_vector"),
      new ExpressionInfo(classOf[QuantizeVector].getName, "quantize_vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize_vector(arrayOfFloat)")
        QuantizeVector(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("fm_workingdaysbetween"),
      new ExpressionInfo(classOf[WorkingDaysBetween].getName, "fm_workingdaysbetween"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "fm_workingdaysbetween(start, end)")
        WorkingDaysBetween(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head,
            org.apache.spark.sql.types.DateType),
          org.apache.spark.sql.catalyst.expressions.Cast(args(1),
            org.apache.spark.sql.types.DateType))
      }))
  }
}
