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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.polyHashDescriptor)
  }
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

  private val polyHashDescriptor = (
    new FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "poly_hash(s) takes exactly 1 argument")
      PolyHash(children.head)
    }
  )

  /** Register graft functions on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      children => {
        require(children.size == 2, "dot_product(a, b) takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash",
      children => {
        require(children.size == 1, "poly_hash(s) takes exactly 1 argument")
        PolyHash(children.head)
      },
      "scala_udf")
  }
}
