package graft.plans

import graft.functions.{FloatDotProduct, FloatL2Norm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("... float_dot(a, b)")`
  * plans them with codegen. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_dot takes 2 arguments")
        FloatDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("float_norm"),
      new ExpressionInfo(classOf[FloatL2Norm].getName, "float_norm"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "float_norm takes 1 argument")
        FloatL2Norm(children(0))
      }))
  }
}
