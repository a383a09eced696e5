package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** text → sorted distinct 64-bit hashes of its word k-gram shingles, in
  * ONE codegen'd pass (lowercase, whitespace-tokenize, slide the k-gram
  * window, XXH64 each shingle, sort + dedup). Replaces the interpreted
  * transform/element_at/concat_ws lambda stack: at corpus scale the
  * shingling pass dominates dedup preprocessing, so it must run as
  * straight JVM code inside the scan projection. Hash values equal
  * xxhash64(concat_ws(" ", w[i], w[i+1], w[i+2])) — seed 42 over the
  * identical shingle string — so downstream stages are unchanged.
  */
object ShingleUtil {
  private val Ws = Pattern.compile("\\s+")

  def hashedShingles(text: UTF8String, k: Int): GenericArrayData = {
    val s = text.toString.toLowerCase.trim
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val w = Ws.split(s)
    if (w.length < k) return new GenericArrayData(Array.emptyLongArray)
    val n = w.length - k + 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      hs(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var out = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }
}

case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.hashedShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.hashedShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.toColumn(HashedShingles(ColumnBridge.toExpression(c), k))
}
