package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.ann.HyperplaneCodeExpression
import graft.text.StemArrayExpression

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("SELECT porter_stem(...)")`
  * and `hyperplane_code(vec, dim, bits, table)` work in any session built
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"hyperplane_code $what must be an integer literal, got $other")
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("porter_stem"),
        new ExpressionInfo(classOf[StemArrayExpression].getName, "porter_stem"),
        (children: Seq[Expression]) => new StemArrayExpression(children.head)),
      (
        FunctionIdentifier("hyperplane_code"),
        new ExpressionInfo(classOf[HyperplaneCodeExpression].getName, "hyperplane_code"),
        (children: Seq[Expression]) => {
          require(children.length == 4,
            "hyperplane_code(embedding array<double>, dim, bits, table)")
          new HyperplaneCodeExpression(children.head,
            intLit(children(1), "dim"), intLit(children(2), "bits"),
            intLit(children(3), "table"))
        }))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
