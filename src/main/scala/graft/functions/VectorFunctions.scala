package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graft.ColumnBridge

/** Vector math as a native codegen'd Catalyst expression.
  *
  * Higher-order functions (`aggregate`/`zip_with`) evaluate their lambda
  * interpreted, one closure call per element — fine for a few thousand
  * scores, ruinous for an all-pairs similarity join (millions of pairs ×
  * 64 dims). This expression compiles to a single static call over the
  * unsafe array data: a tight primitive loop, no per-element allocation.
  * The accumulation is the same left-to-right double fold as the
  * `aggregate()` formulation and DuckDB's `list_reduce`, so results stay
  * bit-identical with the oracle.
  */
object VectorUtil {
  /** Sequential left-fold dot product over double arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: dot_product(a, b) over array<double> columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProduct(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
