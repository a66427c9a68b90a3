package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSim

/** Session extension registering graft's native expressions with the
  * SQL function registry, so `spark.sql("... graft_cosine(a, b) ...")`
  * and `call_function("graft_cosine", ...)` resolve everywhere —
  * enable via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (GraftSession does) or [[GraftExtensions.register]] on a live
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectOptimizerRule(FuseCosine)
  }
}

object GraftExtensions {
  private val cosineDescriptor = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine(arrayA, arrayB)")
      CosineSim(children.head, children(1))
    })

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineDescriptor._1, cosineDescriptor._2, cosineDescriptor._3)
}
