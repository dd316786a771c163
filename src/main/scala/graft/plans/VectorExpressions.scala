package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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
    * as long)) but codegen'd. */
  case class QuantizeE6(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = Math.round(arr.getFloat(i).toDouble * 1000000.0)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |final int $n = $c.numElements();
           |final long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = Math.round((double) $c.getFloat($i) * 1000000.0);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact integer dot product of two long arrays (null if lengths
    * differ — matches zip_with's null-padding turning into a null sum). */
  case class DotLong(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else {
        var acc = 0L
        var i = 0
        val n = a.numElements()
        while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $n = $a.numElements();
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $a.getLong($i) * $b.getLong($i);
           |  }
           |  ${ev.value} = $acc;
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
