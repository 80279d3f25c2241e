package graft.plans

import graft.functions.{FloatDotProduct, FloatL2Norm, JlProject, LshIndexKeys}
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
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          org.apache.spark.sql.GraftBridge.wrongNumArgs("float_dot", 2, children.length)
        FloatDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("float_norm"),
      new ExpressionInfo(classOf[FloatL2Norm].getName, "float_norm"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          org.apache.spark.sql.GraftBridge.wrongNumArgs("float_norm", 1, children.length)
        FloatL2Norm(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_index_keys"),
      new ExpressionInfo(classOf[LshIndexKeys].getName, "lsh_index_keys"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          org.apache.spark.sql.GraftBridge.wrongNumArgs("lsh_index_keys", 1, children.length)
        LshIndexKeys(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jl_project"),
      new ExpressionInfo(classOf[JlProject].getName, "jl_project"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          org.apache.spark.sql.GraftBridge.wrongNumArgs("jl_project", 2, children.length)
        val k = children(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case e => throw new IllegalArgumentException(
            s"jl_project: outDim must be an integer literal, got $e")
        }
        JlProject(children(0), k)
      }))
  }
}
