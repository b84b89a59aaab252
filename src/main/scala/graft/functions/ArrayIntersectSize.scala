package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `size(array_intersect(a, b))` without materializing the intersection:
 * distinct-common-element COUNT over two string arrays. The built-in pair
 * allocates the full intersection array per row only to take its length —
 * at millions of candidate pairs (near-dup verification) the allocation
 * dominates. Semantics identical to the built-in composition (distinct
 * set intersection, nulls not counted).
 */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType) = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_intersect_size needs array<string> inputs, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayIntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayIntersectSize.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayIntersectSize =
    copy(left = l, right = r)
}

object ArrayIntersectSize {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val set = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) set.add(a.getUTF8String(i))
      i += 1
    }
    var n = 0
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j) && set.remove(b.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }

  def arrayIntersectSize(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpr.column(
      ArrayIntersectSize(org.apache.spark.sql.GraftExpr.expression(a),
        org.apache.spark.sql.GraftExpr.expression(b)))
}
