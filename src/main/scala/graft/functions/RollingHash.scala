package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** O(n) Rabin–Karp minimum-window fingerprint, exposed as a native
  * Catalyst expression with codegen (preference order (b) from the build
  * brief: a custom `Expression` beats a Scala UDF).
  *
  * Fingerprint = min over all length-`k` character windows of the
  * polynomial hash `fold((a,b) => (a*31+b) mod P)` seeded with the first
  * character code (P = 1e9+7). Documents shifted by edits share most
  * window hashes, so the min is a cheap near-dup signal — the same idea
  * as winnowing fingerprints. The rolling update makes it O(n) per
  * document instead of O(n·k), which is what makes it viable on 100 TB
  * of text; the value is bit-identical to the per-window fold (modular
  * arithmetic is exact), so a SQL oracle can recompute it windows-wise.
  */
object RollingHashUtil {
  final val Mod: Long = 1000000007L
  final val Base: Long = 31L

  /** Static-forwarder entry point so generated Janino code can call it. */
  def minWindowHash(s: UTF8String, k: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    if (n <= k) return foldHash(str, 0, n)
    // pow = Base^(k-1) mod P, for removing the outgoing character.
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    var h = foldHash(str, 0, k)
    var min = h
    i = k
    while (i < n) {
      val out = str.charAt(i - k).toLong % Mod
      h = (h - out * pow % Mod + Mod) % Mod
      h = (h * Base + str.charAt(i).toLong) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  private def foldHash(s: String, from: Int, until: Int): Long = {
    var acc = s.charAt(from).toLong % Mod
    var i = from + 1
    while (i < until) { acc = (acc * Base + s.charAt(i).toLong) % Mod; i += 1 }
    acc
  }
}

case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    RollingHashUtil.minWindowHash(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashUtil.minWindowHash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  /** Column-API entry: `rolling_min_hash(normText(col), 8)`. */
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      RollingMinHash(org.apache.spark.sql.graft.ColumnBridge.toExpression(c), k))
}
