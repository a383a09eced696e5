package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
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

  /** Driver-side: top-m (near-)orthonormal directions of the second
    * moment M = Σᵢ uᵢuᵢᵀ of the sampled unit vectors, by blocked power
    * iteration with Gram–Schmidt re-orthonormalization. M is never
    * formed — M·B = Σᵢ uᵢ(uᵢ·Bⱼ) costs |sample|·dim·m flops per
    * iteration, all driver-local. EXACTNESS of the prune does not
    * depend on convergence (any orthonormal set yields a valid
    * distance lower bound; quality only affects the prune RATE), so a
    * fixed iteration count with a deterministic seed is sufficient.
    * Degenerate residuals (rank-deficient sample) become zero rows,
    * which contribute 0 to every projected distance — still valid. */
  def topSubspace(sample: Array[Array[Double]], m: Int, iters: Int,
                  seed: Long): Array[Array[Double]] = {
    val dim = if (sample.nonEmpty) sample(0).length else 0
    if (dim == 0) return Array.fill(m)(new Array[Double](0))
    val rnd = new java.util.Random(seed)
    def gs(v: Array[Array[Double]]): Array[Array[Double]] = {
      val out = Array.fill(m)(new Array[Double](dim))
      var j = 0
      while (j < m) {
        val w = v(j).clone()
        var k = 0
        while (k < j) {
          var d = 0.0
          var i = 0
          while (i < dim) { d += w(i) * out(k)(i); i += 1 }
          i = 0
          while (i < dim) { w(i) -= d * out(k)(i); i += 1 }
          k += 1
        }
        var nrm = 0.0
        var i = 0
        while (i < dim) { nrm += w(i) * w(i); i += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 1e-9) { i = 0; while (i < dim) { out(j)(i) = w(i) / nrm; i += 1 } }
        j += 1
      }
      out
    }
    var b = gs(Array.fill(m)(Array.fill(dim)(rnd.nextGaussian())))
    var it = 0
    while (it < iters) {
      val y = Array.fill(m)(new Array[Double](dim))
      var si = 0
      while (si < sample.length) {
        val u = sample(si)
        var j = 0
        while (j < m) {
          var d = 0.0
          var i = 0
          while (i < dim) { d += u(i) * b(j)(i); i += 1 }
          i = 0
          while (i < dim) { y(j)(i) += d * u(i); i += 1 }
          j += 1
        }
        si += 1
      }
      b = gs(y)
      it += 1
    }
    b
  }

  /** True iff Σ (aₖ−bₖ)² provably exceeds `bound` — the shared
    * early-exit projected-distance² test of the q35/q25 prune kernels.
    * Strip-mined into 16-coordinate blocks over FOUR independent
    * accumulators: the naive fused loop is latency-bound on its single
    * accumulator dependency chain (~4 cycles per coordinate on any
    * recent x86/ARM FP unit); four chains run at ~1. The coarser
    * early-exit check (every 16 coords instead of every one) costs ~a
    * third more coordinates on an average pruned pair but wins ~3×
    * net, and float32 accumulation drops the per-coordinate
    * float→double converts for another ~35 %. Exactness: terms are
    * nonnegative so partial sums only grow; the computed sum differs
    * from the true distance² only by float32 rounding (≤ ~m·ε_f·acc
    * ≈ 1e-5 at m ≤ 96 — an order below the callers' 1e-4 prune
    * margin, which is what the margin is FOR); and a NaN coordinate
    * poisons every comparison false → the pair is KEPT and the exact
    * verify decides. */
  def projDistExceeds(a: Array[Float], b: Array[Float], bound: Double): Boolean = {
    val m = math.min(a.length, b.length)
    var acc = 0.0f
    var k = 0
    while (k + 16 <= m) {
      var a0 = 0.0f
      var a1 = 0.0f
      var a2 = 0.0f
      var a3 = 0.0f
      var j = k
      while (j < k + 16) {
        val d0 = a(j) - b(j)
        val d1 = a(j + 1) - b(j + 1)
        val d2 = a(j + 2) - b(j + 2)
        val d3 = a(j + 3) - b(j + 3)
        a0 += d0 * d0
        a1 += d1 * d1
        a2 += d2 * d2
        a3 += d3 * d3
        j += 4
      }
      acc += a0 + a1 + a2 + a3
      if (acc.toDouble > bound) return true
      k += 16
    }
    while (k < m) {
      val d = a(k) - b(k)
      acc += d * d
      if (acc.toDouble > bound) return true
      k += 1
    }
    acc.toDouble > bound
  }

  /** Fit an adaptive orthonormal prune basis from a sample of UNIT
    * vectors: the top `maxDims` (clamped to the vector dimension)
    * directions of the sample second moment via [[topSubspace]],
    * truncated to the smallest eigenvalue-ordered prefix capturing
    * ≥ `varFrac` of the sample variance (= |sample| for unit vectors),
    * clamped to [minDims, maxDims]. A homogeneous corpus concentrates
    * in few directions and pays a small projection payload; a
    * heterogeneous mixture (many sub-vocabularies) spreads out and
    * automatically gets the dims its prune rate needs. Any orthonormal
    * prefix keeps the prune exact, and directions arrive
    * eigenvalue-ordered — also what the early-exit distance wants.
    *
    * An EMPTY (or fully degenerate) sample returns an EMPTY basis:
    * zero projection coordinates, so every projected distance is 0 and
    * the prune degrades to a no-op instead of crashing — the caller
    * needs no special case. */
  def adaptiveBasis(sampleU: Array[Array[Double]], minDims: Int, maxDims: Int,
                    varFrac: Double, iters: Int, seed: Long): Array[Array[Double]] = {
    if (sampleU.isEmpty) return Array.empty
    val dim = sampleU(0).length
    val m = math.min(maxDims, dim)
    val basisFull = topSubspace(sampleU, m, iters, seed)
    val lambdas = basisFull.map { bj =>
      var acc = 0.0
      var si = 0
      while (si < sampleU.length) {
        val u = sampleU(si)
        var d = 0.0
        var j = 0
        while (j < dim) { d += u(j) * bj(j); j += 1 }
        acc += d * d
        si += 1
      }
      acc
    }
    val totalVar = sampleU.length.toDouble
    var cum = 0.0
    var k = 0
    while (k < basisFull.length && cum < varFrac * totalVar) {
      cum += lambdas(k)
      k += 1
    }
    basisFull.take(math.max(math.min(minDims, m), math.min(k, m)))
  }

  /** v → (B·(v − μ)) / ‖v − μ‖ as float32: the doc's unit-centered
    * vector projected onto the m (near-)orthonormal basis rows packed
    * flat in `basisFlat` (bmu(j) = B_j·μ precomputed on the driver, so
    * the executor-side subtraction is one double per coordinate). The
    * projection coordinates ride the LSH band shuffle (m·4 bytes per
    * key row) and power the exactness-preserving candidate prune in
    * [[graft.ops.CorrDedup]]: for orthonormal rows,
    * ‖proj_a − proj_b‖² ≤ ‖û_a − û_b‖² = 2 − 2·corr(a,b), so any pair
    * whose projected distance² exceeds 2−2·t (plus a float-rounding
    * margin) provably sits below the correlation threshold t. */
  def projectCentered(v: ArrayData, basisFlat: ArrayData, bmu: ArrayData,
                      norm: Double): GenericArrayData = {
    val m = bmu.numElements()
    val dim = v.numElements()
    val out = new Array[Float](m)
    var j = 0
    while (j < m) {
      val off = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getDouble(i) * basisFlat.getDouble(off + i); i += 1 }
      out(j) = ((acc - bmu.getDouble(j)) / norm).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Count vector → one packed sign-LSH key per band:
    * key(b) = b·2^bitsPerBand + Σ_f [h_{b·bpb+f}·x ≥ hmu_{b·bpb+f}]·2^f,
    * where hmu is the mean vector's projection (computed once on the
    * driver from the exact bucket totals). Subtracting hmu centers the
    * corpus: raw token-count vectors of same-language text share a huge
    * common component (measured median cosine 0.63 on the test corpus)
    * that would make every sign bit agree; centered, random pairs sit
    * at ~0 correlation and sign-LSH prunes. */
  // Flattened TRANSPOSE of the hyperplane matrix (t(i·bits + k) =
  // h_k(i)): the signature kernel streams it coordinate-major, so the
  // inner loop over all `bits` accumulators reads contiguous memory —
  // at 128×16 = 2048 bits the plane-major layout paid a cache miss per
  // (bit, coordinate) and dominated the whole q35 pipeline.
  private val planesTCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def planesT(seed: Long, bits: Int, dim: Int): Array[Double] =
    planesTCache.computeIfAbsent((seed, bits, dim), { _ =>
      val h = planes(seed, bits, dim)
      val t = new Array[Double](dim * bits)
      var i = 0
      while (i < dim) {
        var k = 0
        while (k < bits) { t(i * bits + k) = h(k)(i); k += 1 }
        i += 1
      }
      t
    })

  def bandKeys(cnt: ArrayData, hmu: ArrayData, seed: Long,
               bands: Int, bitsPerBand: Int): GenericArrayData = {
    val dim = cnt.numElements()
    val bits = bands * bitsPerBand
    val t = planesT(seed, bits, dim)
    // acc_k = Σ_i cnt_i · h_k(i), accumulated in ascending i for every
    // k — the same summation order as the plane-major loop, with exact
    // zero terms skipped, so keys are bit-identical to it.
    val acc = new Array[Double](bits)
    var i = 0
    while (i < dim) {
      val c = cnt.getLong(i)
      if (c != 0L) {
        val cd = c.toDouble
        val off = i * bits
        var k = 0
        while (k < bits) { acc(k) += cd * t(off + k); k += 1 }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = b.toLong << bitsPerBand
      var f = 0
      while (f < bitsPerBand) {
        if (acc(b * bitsPerBand + f) >= hmu.getDouble(b * bitsPerBand + f))
          key |= (1L << f)
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

/** proj = (B·(v − μ))/‖v−μ‖ as array<float> — see
  * [[CorrUtil.projectCentered]]. Children are (v: array<double>,
  * norm: double); the basis and bmu ride as broadcast-by-reference
  * codegen objects (m·dim doubles once per executor, not per row). */
case class ProjectCentered(left: Expression, right: Expression,
                           basisFlat: Array[Double], bmu: Array[Double])
    extends BinaryExpression {
  private lazy val basisData = new GenericArrayData(basisFlat)
  private lazy val bmuData = new GenericArrayData(bmu)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any, norm: Any): Any =
    CorrUtil.projectCentered(v.asInstanceOf[ArrayData], basisData, bmuData,
      norm.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("basisFlat", basisData, classOf[ArrayData].getName)
    val mRef = ctx.addReferenceObj("bmu", bmuData, classOf[ArrayData].getName)
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.CorrUtil.projectCentered($v, $bRef, $mRef, $n)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProjectCentered =
    copy(left = newLeft, right = newRight)
}

object ProjectCentered {
  def apply(v: Column, norm: Column,
            basis: Array[Array[Double]], bmu: Array[Double]): Column =
    ColumnBridge.toColumn(ProjectCentered(
      ColumnBridge.toExpression(v), ColumnBridge.toExpression(norm),
      basis.flatten, bmu))
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
