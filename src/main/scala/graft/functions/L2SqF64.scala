package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared L2 distance between two double arrays as a native codegen
  * expression (r22) — the hot kernel of the exact brute-force arm the
  * ANN recall certifications score per (query, corpus-vector) pair. The
  * composed `aggregate(zip_with(...))` formulation routes every element
  * through interpreted higher-order lambdas ([[DotF64]]'s measured ~40×
  * overhead); this is the same tight primitive loop inside whole-stage
  * codegen.
  *
  * IEEE sequence per element: one rounding for the subtract, one for
  * the multiply, one for the add, ascending index — exactly the fold
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, acc + v)`
  * performs and DuckDB's `list_reduce(list_prepend(0.0, ...))` mirrors,
  * so distances stay bit-identical to both the composed chain and the
  * oracle (pinned by ExpressionsSpec).
  */
case class L2SqF64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.L2SqF64.evalL2($a, $b)")
  override def nullSafeEval(a: Any, b: Any): Any =
    L2SqF64.evalL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqF64 =
    copy(left = l, right = r)
}

object L2SqF64 {
  /** Static entry for generated code (NOT named `eval` — static-forwarder
    * collision with `Expression.eval`, see MinHash64).
    */
  def evalL2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def l2sqf64(a: Column, b: Column): Column =
    ExprUtil.col(L2SqF64(ExprUtil.expr(a), ExprUtil.expr(b)))
}
