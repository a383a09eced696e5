package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, ShortType}
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

  /** Quantization grid for the prune projections: coordinates in
    * [−1, 1] stored as round(x·QuantScale) in a Short. 2047 (12 bits
    *edge to edge) is the sweet spot measured at the 30× sighting:
    * int8 (scale 127) halves the payload again but its slack band
    * (√m/127 ≈ 0.077 at m = 96, i.e. projected-corr window
    * 0.8625–0.90 at threshold 0.9) stops pruning EXACTLY where a
    * near-dup corpus concentrates pair mass — measured +53 % on q35
    * (survivors flood the distinct + verify stage) — while 2047's
    * band (√m/2047 ≈ 0.005, corr window 0.898–0.90) is empty on any
    * realistic spectrum. 16 coordinates of Short still load as one
    * 32-byte vector register, block partial sums fit plain Ints
    * (16·4094² ≈ 2.7e8), and the payload is HALF the former float32
    * bytes through the candidate shuffle and its sort. */
  val QuantScale = 2047

  /** Per-coordinate clamp tolerance for [[projectCentered]]: a
    * coordinate beyond 1 + ClampTol means the norm cancellation went
    * bad and the whole projection degrades to the never-prune
    * sentinel; within it, the residual excess adds at most
    * 2·[[QuantScale]]·ClampTol ≈ 4e-5 to the 2Se term of
    * [[quantThreshold]]'s derivation — inside its 1e-4 budget.
    * Legitimate unit-vector coordinates overshoot by O(1e-12), four
    * orders below this, so real corpora never hit the sentinel. */
  val ClampTol = 1e-8

  /** Integer prune threshold for quantized unit-vector projections:
    * prune a pair iff Σ (Δq)² > quantThreshold(bound, m) ⟹ the TRUE
    * projected distance² exceeds `bound` ⟹ (projection never
    * increases distance) the pair provably sits below the caller's
    * correlation/cosine threshold.
    *
    * Derivation. Each stored coordinate is qᵢ = round(clamp(xᵢ)·S)
    * with S = [[QuantScale]] and |xᵢ| ≤ 1 + [[ClampTol]] (any larger
    * excursion — possible when the caller's norm is computed by a
    * cancellation-prone formula — makes [[projectCentered]] emit the
    * never-prune sentinel instead of clamping), so
    * |xᵢ − qᵢ/S| ≤ 1/(2S) + ClampTol + 1e-9 =: e per coordinate, and
    * for m dims ‖x_a − x_b‖ ≥ ‖Δq‖/S − 2e√m. Requiring
    * ‖Δq‖ > S·√bound + 1.0001·√m (the 1.0001 covers
    * 2Se = 1 + 2S·(ClampTol + 1e-9) < 1 + 4.6e-5 with margin)
    * therefore forces ‖x_a − x_b‖² > bound.
    * The integer compare makes the kernel branch-exact: no float
    * rounding can flip a prune decision. The quantization slack
    * (≈ √m/S, 0.005 at m = 96) only LOWERS the prune rate — pairs
    * whose projected distance lands inside the slack band are kept
    * and settled by the exact verify — never the exactness. */
  def quantThreshold(bound: Double, m: Int): Long = {
    if (m <= 0) return Long.MaxValue
    val t = QuantScale * math.sqrt(bound) + 1.0001 * math.sqrt(m.toDouble)
    math.ceil(t * t).toLong
  }

  /** True iff Σ (aₖ−bₖ)² > t2 for [[QuantScale]]-quantized
    * projections — the shared early-exit projected-distance² test of
    * the q35/q25 prune kernels (threshold from [[quantThreshold]]).
    * Strip-mined into 16-coordinate blocks over FOUR independent int
    * accumulators (16 Shorts = one 32-byte vector register per side
    * per block; short loads widen to int for free), early-exit check
    * per block. The quantized payload halves the former float32 bytes
    * through the candidate shuffle and its sort, and halves the cache
    * lines per pair in the enumeration loop (the mid-correlation
    * pairs that dominate a near-dup corpus never exit early — they
    * pay the FULL scan). Exactness: terms are nonnegative so partial
    * sums only grow, the arithmetic is exact integers (block partials
    * ≤ 16·4094² < 2³¹, the running total in a Long), and the
    * degenerate-doc sentinel (an EMPTY array, the quantizer's image
    * of a non-finite projection) never prunes — the pair is KEPT and
    * the exact verify decides. */
  def projDistExceedsQ(a: Array[Short], b: Array[Short], t2: Long): Boolean = {
    val m = a.length
    if (m == 0 || b.length != m) return false
    var acc = 0L
    var k = 0
    while (k + 16 <= m) {
      var a0 = 0
      var a1 = 0
      var a2 = 0
      var a3 = 0
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
      if (acc > t2) return true
      k += 16
    }
    while (k < m) {
      val d = a(k) - b(k)
      acc += d * d
      if (acc > t2) return true
      k += 1
    }
    acc > t2
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

  /** v → (B·(v − μ)) / ‖v − μ‖, quantized to the [[QuantScale]]
    * grid: the doc's unit-centered vector projected onto the m
    * (near-)orthonormal basis rows packed flat in `basisFlat`
    * (bmu(j) = B_j·μ precomputed on the driver, so the executor-side
    * subtraction is one double per coordinate), each coordinate
    * stored as round(clamp(x, ±1)·QuantScale) in a Short.
    * Coordinates of a unit vector on an orthonormal basis sit in
    * [−1, 1] up to double rounding, so the clamp loses nothing; the
    * quantization error budget lives in [[quantThreshold]]'s slack
    * term. The caller's `norm` can come from a cancellation-prone
    * formula (q35 uses √(ss − 2p/n + qn²)), so a coordinate CAN
    * exceed 1 by more than double rounding when the norm collapses —
    * any excursion past 1 + [[ClampTol]] therefore yields the same
    * never-prune sentinel as a non-finite projection, and the
    * residual clamp excess (≤ ClampTol per coordinate, i.e.
    * 2·QuantScale·ClampTol ≈ 4e-5 added to 2Se) stays inside
    * [[quantThreshold]]'s 1.0001 factor (budget 1e-4). The projection rides the LSH band shuffle at TWO bytes per
    * dim (m ≤ 192 bytes per key row — half the former float32
    * payload through both the shuffle and the kernel's sort) and
    * powers the exactness-preserving candidate prune in
    * [[graft.ops.CorrDedup]] / the q25 kernel: for orthonormal rows,
    * ‖proj_a − proj_b‖² ≤ ‖û_a − û_b‖² = 2 − 2·corr(a,b), so a pair
    * whose quantized distance² exceeds [[quantThreshold]](2−2·t, m)
    * provably sits below the threshold t. A non-finite projection
    * (degenerate ‖v−μ‖ = 0 doc) yields the EMPTY array — the sentinel
    * [[projDistExceedsQ]] never prunes (a per-DOC property: a finite
    * norm makes every coordinate finite, so one non-finite coordinate
    * implies all are). */
  def projectCentered(v: ArrayData, basisFlat: ArrayData, bmu: ArrayData,
                      norm: Double): GenericArrayData = {
    val m = bmu.numElements()
    val dim = v.numElements()
    val out = new Array[Short](m)
    var j = 0
    while (j < m) {
      val off = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getDouble(i) * basisFlat.getDouble(off + i); i += 1 }
      val x = (acc - bmu.getDouble(j)) / norm
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x) ||
          x > 1.0 + ClampTol || x < -(1.0 + ClampTol))
        return new GenericArrayData(Array.empty[Short])
      val c = if (x > 1.0) 1.0 else if (x < -1.0) -1.0 else x
      out(j) = math.round(c * QuantScale.toDouble).toShort
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

/** proj = (B·(v − μ))/‖v−μ‖ quantized to array<short> on the
  * [[CorrUtil.QuantScale]] grid — see
  * [[CorrUtil.projectCentered]]. Children are (v: array<double>,
  * norm: double); the basis and bmu ride as broadcast-by-reference
  * codegen objects (m·dim doubles once per executor, not per row). */
case class ProjectCentered(left: Expression, right: Expression,
                           basisFlat: Array[Double], bmu: Array[Double])
    extends BinaryExpression {
  private lazy val basisData = new GenericArrayData(basisFlat)
  private lazy val bmuData = new GenericArrayData(bmu)
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
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
