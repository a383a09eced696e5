package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the correlation near-dup pipeline (DedupOps q35):
  * token-bucket count vectors and banded sign-LSH keys, each a single
  * codegen'd pass over the row — the 100 TB signature cost is exactly
  * one corpus scan, no explode/groupBy/UDF in the hot path.
  */
object CorrUtil {
  private val Ws = Pattern.compile("\\s+")
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private[functions] def md5Digest(): MessageDigest = md5Local.get()

  /** Token → bucket in [0, dim): the 2nd and 3rd hex chars of
    * md5(token). Chosen because DuckDB reproduces it verbatim
    * (`strpos('0123456789abcdef', substring(md5(t), 2, 1))` etc.), so
    * the oracle builds bit-identical vectors. hex2 = low nibble of
    * byte 0, hex3 = high nibble of byte 1. */
  def bucketOf(token: String, dim: Int): Int = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(token.getBytes(StandardCharsets.UTF_8))
    ((h(0) & 0x0f) * 16 + ((h(1) >>> 4) & 0x0f)) % dim
  }

  /** text → dense array<long> of per-bucket token counts (lowercase,
    * whitespace-split, empty tokens dropped — the exact token stream of
    * DuckDB's `string_split_regex(lower(trim(text)), '\s+')` filtered
    * on `t <> ''`). */
  def bucketCounts(text: UTF8String, dim: Int): GenericArrayData = {
    val out = new Array[Long](dim)
    val w = Ws.split(text.toString.toLowerCase)
    var i = 0
    while (i < w.length) {
      if (!w(i).isEmpty) out(bucketOf(w(i), dim)) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }

  // Hyperplanes are derived deterministically from (seed, bits, dim) in
  // every JVM (java.util.Random is a fixed algorithm), so executors
  // regenerate them instead of shipping 192×256 doubles per task.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  def planes(seed: Long, bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, bits, dim), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(bits, dim)(rnd.nextGaussian())
    })

  /** Count vector → one packed sign-LSH key per band:
    * key(b) = b·2^bitsPerBand + Σ_f [h_{b·bpb+f}·x ≥ hmu_{b·bpb+f}]·2^f,
    * where hmu is the mean vector's projection (computed once on the
    * driver from the exact bucket totals). Subtracting hmu centers the
    * corpus: raw token-count vectors of same-language text share a huge
    * common component (measured median cosine 0.63 on the test corpus)
    * that would make every sign bit agree; centered, random pairs sit
    * at ~0 correlation and sign-LSH prunes. */
  def bandKeys(cnt: ArrayData, hmu: ArrayData, seed: Long,
               bands: Int, bitsPerBand: Int): GenericArrayData = {
    val dim = cnt.numElements()
    val h = planes(seed, bands * bitsPerBand, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = b.toLong << bitsPerBand
      var f = 0
      while (f < bitsPerBand) {
        val pl = h(b * bitsPerBand + f)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += cnt.getLong(i) * pl(i); i += 1 }
        if (acc >= hmu.getDouble(b * bitsPerBand + f)) key |= (1L << f)
        f += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}

object SimHashMd5Util {
  /** 64-bit SimHash over md5 token hashes (first 8 digest bytes,
    * big-endian; ±1 vote per bit with multiplicity; bit set when votes
    * are positive). md5 instead of xxhash64 makes the value
    * oracle-expressible: DuckDB rebuilds the same bits nibble-wise. */
  def simHash(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    val d = CorrUtil.md5Digest()
    var t = 0
    while (t < tokens.numElements()) {
      d.reset()
      val h = d.digest(tokens.getUTF8String(t).getBytes)
      var hv = 0L
      var j = 0
      while (j < 8) { hv = (hv << 8) | (h(j) & 0xffL); j += 1 }
      var i = 0
      while (i < 64) {
        if (((hv >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    SimHashMd5Util.simHash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5Util.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  def apply(c: Column): Column =
    ColumnBridge.toColumn(SimHashMd5(ColumnBridge.toExpression(c)))
}

case class TokenBucketCounts(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    CorrUtil.bucketCounts(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CorrUtil.bucketCounts($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): TokenBucketCounts =
    copy(child = newChild)
}

object TokenBucketCounts {
  def apply(c: Column, dim: Int): Column =
    ColumnBridge.toColumn(TokenBucketCounts(ColumnBridge.toExpression(c), dim))
}

case class LshBandKeys(child: Expression, hmu: Array[Double], seed: Long,
                       bands: Int, bitsPerBand: Int) extends UnaryExpression {
  private lazy val hmuData = new GenericArrayData(hmu)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    CorrUtil.bandKeys(v.asInstanceOf[ArrayData], hmuData, seed, bands, bitsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hmuRef = ctx.addReferenceObj("hmu", hmuData, classOf[ArrayData].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CorrUtil.bandKeys($c, $hmuRef, ${seed}L, $bands, $bitsPerBand)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {
  def apply(c: Column, hmu: Array[Double], seed: Long,
            bands: Int, bitsPerBand: Int): Column =
    ColumnBridge.toColumn(
      LshBandKeys(ColumnBridge.toExpression(c), hmu, seed, bands, bitsPerBand))
}
