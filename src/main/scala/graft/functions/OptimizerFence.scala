package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/**
 * Identity wrapper that reports itself non-deterministic: a surgical
 * optimizer fence.
 *
 * Why it exists: Catalyst's `PushDownPredicates` inlines a filter through
 * any all-deterministic Project and merges it into a join condition. For
 * a filter over an EXPENSIVE projected column (e.g. `jaccard` derived
 * from a per-pair set-intersection) that is a measured pessimization —
 * the pushed conjunct lands ahead of the cheap pruning conjuncts in the
 * join's residual condition and re-evaluates the intersection per
 * reference (join conditions get no subexpression elimination), which is
 * exactly the round-2 `dedup_ngram_jaccard` regression (2.6s → 5.5s at
 * sf0.1). Wrapping the expensive column in `fence` keeps the filter
 * ABOVE the projection: the heavy expression is computed once per
 * surviving join row, period.
 *
 * The wrapper changes no values and no nullability; `deterministic =
 * false` is metadata only (the expression does not extend
 * `Nondeterministic`, needs no per-partition init, and stays inside
 * whole-stage codegen — codegen delegates straight to the child).
 */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "optimizer_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  /** Column API: `fence(expensiveCol)` — same values, not pushed past. */
  def fence(c: Column): Column =
    org.apache.spark.sql.GraftExpr.column(
      OptimizerFence(org.apache.spark.sql.GraftExpr.expression(c)))
}
