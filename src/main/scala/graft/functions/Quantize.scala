package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass int8 symmetric quantization summary over a float embedding:
  * scale = max |x|, q_i = floor(x_i / scale · 127 + 0.5) ∈ [−127, 127].
  * Every step is IEEE-exact-rounded double arithmetic on exactly-widened
  * floats, so any engine replays it bit-identically — floor-based
  * rounding instead of round() half-even/half-away, which differs across
  * engines. A single static JVM loop per row (the same kernel discipline
  * as MinHashSig/SimHash64): the 100 TB cost is one array pass, no
  * shuffle, no interpreted per-element lambda stack.
  */
object QuantizeUtil {

  /** Returns (q_sum, q_min, q_max, scale); an empty or all-zero vector
    * quantizes to zeros with its scale (0.0 when empty/all-zero). */
  def quantize8(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(arr.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    var sum = 0L
    var mn = 0L
    var mx = 0L
    if (n > 0 && maxAbs > 0.0) {
      mn = Long.MaxValue
      mx = Long.MinValue
      i = 0
      while (i < n) {
        val q = math.floor(arr.getFloat(i).toDouble / maxAbs * 127.0 + 0.5).toLong
        sum += q
        if (q < mn) mn = q
        if (q > mx) mx = q
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](sum, mn, mx, maxAbs))
  }
}

case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    QuantizeUtil.quantize8(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeUtil.quantize8($c)")
  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  def apply(c: Column): Column =
    ColumnBridge.toColumn(Int8Quantize(ColumnBridge.toExpression(c)))
}
