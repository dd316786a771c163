package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... dot_e6(a, b) ...")`
  * works everywhere the Scala Column API does.
  *
  * Wire up with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("quantize_e6"),
      new ExpressionInfo(classOf[VectorExpressions.QuantizeE6].getName, "quantize_e6"),
      (children: Seq[Expression]) => GraftExtensions.buildQuantize(children)))
    ext.injectFunction((
      new FunctionIdentifier("dot_e6"),
      new ExpressionInfo(classOf[VectorExpressions.DotLong].getName, "dot_e6"),
      (children: Seq[Expression]) => GraftExtensions.buildDot(children)))
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private[plans] def buildQuantize(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"quantize_e6 expects 1 argument, got ${children.length}")
    VectorExpressions.QuantizeE6(children.head)
  }

  private[plans] def buildDot(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"dot_e6 expects 2 arguments, got ${children.length}")
    VectorExpressions.DotLong(children(0), children(1))
  }

  /** Attach [[RangeJoinRewrite]] to an already-running session via
    * `experimental.extraOptimizations` (the builder-time extensions
    * path only applies to new sessions). Idempotent. */
  def enableRangeJoinRewrite(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite

  def disableRangeJoinRewrite(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)

  /** Attach [[AsOfJoinStrategy]] to an already-running session (the
    * planner twin of [[enableRangeJoinRewrite]]). Idempotent. */
  def enableAsOfJoinStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Register the same functions on an already-running session (the
    * builder-time extensions path only applies to new sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("quantize_e6", buildQuantize, "scala_udf")
    reg.createOrReplaceTempFunction("dot_e6", buildDot, "scala_udf")
  }
}
