package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Long-array dot product as a native codegen expression — the
  * fixed-point kernel of the power-iteration family ([[DotF64]]'s
  * integer twin). The composed `aggregate(zip_with(...))` formulation
  * routes every element through interpreted higher-order lambdas; this
  * is a tight primitive loop inside whole-stage codegen.
  *
  * Arithmetic is exact long multiply-add with Java wrap semantics —
  * identical to the non-ANSI `x * w` / `a + t` the lambda chain
  * performed (callers stay inside the long-safe envelope anyway), so
  * values are bit-identical to the chain and to the DuckDB oracle's
  * BIGINT fold.
  */
case class DotI64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotI64.evalDot($a, $b)")
  override def nullSafeEval(a: Any, b: Any): Any =
    DotI64.evalDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI64 =
    copy(left = l, right = r)
}

object DotI64 {
  /** Static entry for generated code (NOT named `eval` — static-forwarder
    * collision with `Expression.eval`, see MinHash64).
    */
  def evalDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def doti64(a: Column, b: Column): Column =
    ExprUtil.col(DotI64(ExprUtil.expr(a), ExprUtil.expr(b)))
}
