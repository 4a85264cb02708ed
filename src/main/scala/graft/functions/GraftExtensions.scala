package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's custom expressions, so
  * they are first-class SQL functions (`SELECT dot_product(a, b)`) on
  * any session launched with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` —
  * the standard way a library ships Catalyst extensions to a cluster.
  * `register` does the same for an already-running session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
}

object GraftExtensions {

  private val dotProductDescriptor = (
    new FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_product(a, b) takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    }
  )

  /** Register graft functions on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      children => {
        require(children.size == 2, "dot_product(a, b) takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      },
      "scala_udf")
}
