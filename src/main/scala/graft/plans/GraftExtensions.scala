package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{Coercions, PersianText, RelativeDates}

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
    GraftExtensions.columnMacros.foreach { case (name, arity, f) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        GraftExtensions.macroBuilder(name, arity, f)))
    }
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

  /** The engine's Column-function library as SQL "macros": each entry
    * (name, arity, body) becomes a FunctionRegistry function whose
    * builder INLINES the Column composition into the plan — SQL users
    * get the exact semantics AND codegen of the Scala API (these are
    * built-in expression trees, not UDF black boxes, so pushdown and
    * constant folding see through them). */
  private[plans] val columnMacros: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("graft_digits", 1, (cs: Seq[Column]) => PersianText.persianToEnglishDigits(cs.head)),
    ("graft_clean_text", 1, (cs: Seq[Column]) => PersianText.cleanText(cs.head)),
    ("graft_strip_marks", 1, (cs: Seq[Column]) => PersianText.stripDirectionalMarks(cs.head)),
    ("graft_slug", 1, (cs: Seq[Column]) => PersianText.toSlug(cs.head)),
    ("graft_to_double", 1, (cs: Seq[Column]) => PersianText.toDoubleOrNull(cs.head)),
    ("graft_to_long", 1, (cs: Seq[Column]) => PersianText.toLongOrNull(cs.head)),
    ("graft_parse_toman", 1, (cs: Seq[Column]) => PersianText.parseTomanAmount(cs.head)),
    ("graft_property_type", 1, (cs: Seq[Column]) => PersianText.normalizePropertyType(cs.head)),
    ("graft_floor_of_total", 1, (cs: Seq[Column]) => PersianText.floorOfTotal(cs.head)),
    ("graft_tehran_to_utc", 1, (cs: Seq[Column]) => RelativeDates.tehranToUtcIso(cs.head)),
    ("graft_truthy", 1, (cs: Seq[Column]) => Coercions.toBoolTruthy(cs.head)),
    ("graft_date_divar", 2, (cs: Seq[Column]) => RelativeDates.textToDateDivar(cs(0), cs(1))),
    ("graft_date_kilid", 2, (cs: Seq[Column]) => RelativeDates.textToDateKilid(cs(0), cs(1))),
    ("graft_date_sheypoor", 2, (cs: Seq[Column]) => RelativeDates.textToDateSheypoor(cs(0), cs(1))),
    ("graft_build_year", 2, (cs: Seq[Column]) => RelativeDates.ageToBuildYear(cs(0), cs(1))))

  private[plans] def macroBuilder(name: String, arity: Int,
                                  f: Seq[Column] => Column): Seq[Expression] => Expression =
    children => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      ColumnBridge.resolvedExpression(f(children.map(ColumnBridge.column)))
    }

  /** Register the same functions on an already-running session (the
    * builder-time extensions path only applies to new sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("quantize_e6", buildQuantize, "scala_udf")
    reg.createOrReplaceTempFunction("dot_e6", buildDot, "scala_udf")
    columnMacros.foreach { case (name, arity, f) =>
      reg.createOrReplaceTempFunction(name, macroBuilder(name, arity, f), "scala_udf")
    }
  }
}
