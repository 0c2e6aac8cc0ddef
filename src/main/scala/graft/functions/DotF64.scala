package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Double-array dot product as a native codegen expression — the hot
  * kernel of embedding similarity (cosine scoring over candidate
  * pairs). The composed `aggregate(zip_with(...))` formulation routes
  * every element through interpreted higher-order lambdas (~40× the
  * cost measured at sf0.1); this is a tight primitive loop inside
  * whole-stage codegen.
  *
  * Accumulation order is ascending index with one rounding per
  * multiply and one per add — exactly the sequence DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(...)))` fold performs,
  * so results stay bit-identical to the oracle.
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotF64.evalDot($a, $b)")
  override def nullSafeEval(a: Any, b: Any): Any =
    DotF64.evalDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
    copy(left = l, right = r)
}

object DotF64 {
  /** Static entry for generated code (NOT named `eval` — static-forwarder
    * collision with `Expression.eval`, see MinHash64).
    */
  def evalDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotf64(a: Column, b: Column): Column =
    ExprUtil.col(DotF64(ExprUtil.expr(a), ExprUtil.expr(b)))
}
