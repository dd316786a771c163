package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §2.9
  * stance: built-ins first, custom Expression where built-ins can't keep
  * up). Catalyst's higher-order functions (`transform`, `zip_with`,
  * `aggregate`) evaluate their lambdas interpreted — per-element
  * NamedLambdaVariable writes, no codegen. For a 64-dim dot product per
  * candidate pair that interpretation dominates the ANN queries, so
  * these two expressions generate tight primitive loops instead.
  *
  * Semantics are bit-identical to the HOF formulations they replace
  * (same quantization, same left-to-right exact integer accumulation),
  * so the DuckDB oracles are unchanged.
  */
object VectorExpressions {

  /** round(x * 1e6) per element, float/double array → long array.
    * Equivalent to transform(a, x -> cast(round(cast(x as double)*1e6)
    * as long)) but codegen'd. Accepts array<float> and array<double>
    * (it's SQL-registered as quantize_e6, so the element type is
    * user-controlled); anything else is an analysis-time error, not
    * garbage reads. Null elements pass through as null elements, like
    * the transform() formulation. */
  case class QuantizeE6(child: Expression)
      extends UnaryExpression {

    private lazy val (elemIsDouble: Boolean, elemNullable: Boolean) =
      child.dataType match {
        case ArrayType(DoubleType, n) => (true, n)
        case ArrayType(_, n)          => (false, n)
        case _                        => (false, false)
      }

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_e6 requires array<float> or array<double> input, got ${other.sql}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = elemNullable)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      def elem(i: Int): Double =
        if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      if (!elemNullable) {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          out(i) = Math.round(elem(i) * 1000000.0)
          i += 1
        }
        new GenericArrayData(out)
      } else {
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) out(i) = Math.round(elem(i) * 1000000.0)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        val get = if (elemIsDouble) s"$c.getDouble" else s"(double) $c.getFloat"
        if (!elemNullable)
          s"""
             |final int $n = $c.numElements();
             |final long[] $out = new long[$n];
             |for (int $i = 0; $i < $n; $i++) {
             |  $out[$i] = Math.round($get($i) * 1000000.0);
             |}
             |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           """.stripMargin
        else
          s"""
             |final int $n = $c.numElements();
             |final Object[] $out = new Object[$n];
             |for (int $i = 0; $i < $n; $i++) {
             |  if (!$c.isNullAt($i)) {
             |    $out[$i] = Math.round($get($i) * 1000000.0);
             |  }
             |}
             |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact integer dot product of two long arrays. Null if lengths
    * differ (matches zip_with's null-padding turning into a null sum)
    * or if any element is null (matches `null * x` / `null + x`
    * propagation in the HOF formulation). Only array<bigint> inputs
    * pass analysis — it's SQL-registered as dot_long, so arbitrary
    * element types are reachable and must not be read as garbage. */
  case class DotLong(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    private lazy val anyElemNullable: Boolean = (left.dataType, right.dataType) match {
      case (ArrayType(_, l), ArrayType(_, r)) => l || r
      case _                                  => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"dot_long requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
      }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else {
        var acc = 0L
        var i = 0
        val n = a.numElements()
        if (anyElemNullable) {
          while (i < n) {
            if (a.isNullAt(i) || b.isNullAt(i)) return null
            acc += a.getLong(i) * b.getLong(i); i += 1
          }
        } else {
          while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val nullGuard =
          if (anyElemNullable)
            s"""
               |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
               |      ${ev.isNull} = true; break;
               |    }
             """.stripMargin
          else ""
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $n = $a.numElements();
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {$nullGuard
           |    $acc += $a.getLong($i) * $b.getLong($i);
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = $acc;
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // Column-level API (classic Spark: Column.apply over the expression).
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def quantize_e6(c: Column): Column = column(QuantizeE6(expression(c)))
  def dot_long(a: Column, b: Column): Column =
    column(DotLong(expression(a), expression(b)))
}
