package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd sketch kernels for the dedup pipeline. Both replace wide
  * stacks of interpreted higher-order-function lambdas (32 transforms
  * for MinHash, 64 conditional sums for SimHash) with a single static
  * JVM loop per row — the per-row cost at 100 TB is one array pass, and
  * neither needs a shuffle.
  */
object HashUtil {

  /** k-permutation MinHash signature over pre-hashed shingles:
    * sig[j] = min over h of XXH64(h, seed=j). */
  def minHashSig(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      val n = hashes.numElements()
      var i = 0
      while (i < n) {
        val v = XXH64.hashLong(hashes.getLong(i), j.toLong)
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over string tokens: per-bit ±1 votes of
    * XXH64(token, seed=42) — same hash as Spark's xxhash64(col). */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashUtil.minHashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.minHashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(c), k))
}

/** Banded early-exit Levenshtein: the exact edit distance when it is
  * <= threshold, and -1 otherwise. The threshold is a per-ROW column
  * (Spark's own `levenshtein(l, r, k)` requires a foldable threshold),
  * which is what a prune-against-a-per-key-upper-bound plan needs: the
  * kernel only fills the |a|×(2k+1) diagonal band instead of the full
  * |a|×|b| DP matrix and abandons a row pair as soon as the band's
  * minimum exceeds k. Delegates to UTF8String.levenshteinDistance's
  * thresholded implementation so semantics match the SQL builtin.
  */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    a.asInstanceOf[UTF8String]
      .levenshteinDistance(b.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) => s"$a.levenshteinDistance($b, $k)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LevenshteinWithin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LevenshteinWithin {
  def apply(a: Column, b: Column, k: Column): Column =
    ColumnBridge.toColumn(LevenshteinWithin(ColumnBridge.toExpression(a),
      ColumnBridge.toExpression(b), ColumnBridge.toExpression(k)))
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashUtil.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpression(c)))
}
