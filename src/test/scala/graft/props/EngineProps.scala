package graft.props

import graft.functions.{HashUtil, RollingHashUtil}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks over the pure kernels (no SparkSession):
  * rolling-hash ≡ per-window fold, window containment, MinHash
  * signature bounds/permutation-invariance, SimHash order-invariance.
  */
object EngineProps extends Properties("graft.kernels") {

  private val Mod = RollingHashUtil.Mod
  private def fold(cs: Seq[Char]): Long =
    cs.tail.foldLeft(cs.head.toLong % Mod)((a, c) => (a * 31 + c) % Mod)
  private def brute(s: String, k: Int): Long =
    if (s.isEmpty) 0L
    else if (s.length <= k) fold(s.toSeq)
    else (0 to s.length - k).map(i => fold(s.slice(i, i + k).toSeq)).min

  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '))).map(_.mkString)
  private val window: Gen[Int] = Gen.chooseNum(2, 12)

  property("rollingMinHash == brute-force window fold") =
    forAll(text, window) { (s, k) =>
      RollingHashUtil.minWindowHash(UTF8String.fromString(s), k) == brute(s, k)
    }

  property("prefixing text never raises the min-window hash (superset of windows)") =
    forAll(text.suchThat(_.length >= 12), window) { (s, k) =>
      val base = RollingHashUtil.minWindowHash(UTF8String.fromString(s), k)
      val ext = RollingHashUtil.minWindowHash(UTF8String.fromString("zz" + s), k)
      ext <= base || s.length < k
    }

  private val hashArr: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.long)

  property("minHashSig is permutation-invariant (set semantics)") =
    forAll(hashArr) { hs =>
      val a = HashUtil.minHashSig(new GenericArrayData(hs.toArray), 8)
      val b = HashUtil.minHashSig(new GenericArrayData(scala.util.Random.shuffle(hs).toArray), 8)
      a.toLongArray.toSeq == b.toLongArray.toSeq
    }

  property("minHashSig of a superset is elementwise <= the subset's") =
    forAll(hashArr, hashArr) { (xs, ys) =>
      val sub = HashUtil.minHashSig(new GenericArrayData(xs.toArray), 8).toLongArray
      val sup = HashUtil.minHashSig(new GenericArrayData((xs ++ ys).toArray), 8).toLongArray
      sub.zip(sup).forall { case (s, u) => u <= s }
    }

  private val tokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))

  property("simHash64 is order-invariant over tokens") =
    forAll(tokens) { ts =>
      def sh(l: List[String]) = HashUtil.simHash64(
        new GenericArrayData(l.map(UTF8String.fromString).toArray))
      sh(ts) == sh(scala.util.Random.shuffle(ts))
    }

  /** Model of q18's candidate filters over sorted hash sets: a pair
    * survives if (1) some shared token lies in BOTH prefixes,
    * (2) size ratio ≥ t, (3) min positional upper bound ≥ required
    * overlap. Property: no pair with true Jaccard ≥ t is ever dropped. */
  private def survives(x: Vector[Long], y: Vector[Long], t: Double): Boolean = {
    def prefixLen(n: Int) = n - math.ceil(n * t).toInt + 1
    val (px, py) = (prefixLen(x.length), prefixLen(y.length))
    val posX = x.take(px).zipWithIndex.toMap
    val posY = y.take(py).zipWithIndex.toMap
    val shared = posX.keySet intersect posY.keySet
    if (shared.isEmpty) return false
    if (math.min(x.length, y.length) < math.max(x.length, y.length) * t) return false
    val ub = shared.iterator.map { h =>
      val (i, j) = (posX(h), posY(h))
      math.min(i, j) + math.min(x.length - i, y.length - j)
    }.min
    ub * (1.0 + t) >= t * (x.length + y.length)
  }

  private val docSet: Gen[Vector[Long]] =
    Gen.chooseNum(3, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 60L))).map(_.distinct.sorted.toVector)
      .suchThat(_.nonEmpty)

  property("positional+size prefix filters never drop a pair with Jaccard >= t") =
    forAll(docSet, docSet) { (x, y) =>
      val inter = x.toSet.intersect(y.toSet).size.toDouble
      val jac = inter / (x.length + y.length - inter)
      val t = 0.5
      Prop.collect(if (jac >= t) "similar" else "dissimilar") {
        jac < t || survives(x, y, t)
      }
    }

  private val docText: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaLowerChar, 1 -> Gen.alphaUpperChar,
      2 -> Gen.const(' '))).map(_.mkString)

  property("tokenBucketCounts total equals the non-empty token count") =
    forAll(docText) { s =>
      val counts = graft.functions.CorrUtil
        .bucketCounts(UTF8String.fromString(s), 256).toLongArray
      val tokens = s.toLowerCase.split("\\s+").count(_.nonEmpty)
      counts.sum == tokens && counts.forall(_ >= 0)
    }

  property("tokenBucketCounts is case-insensitive and word-order-invariant") =
    forAll(tokens) { ts =>
      def v(l: List[String]) = graft.functions.CorrUtil
        .bucketCounts(UTF8String.fromString(l.mkString(" ")), 256).toLongArray.toSeq
      v(ts) == v(scala.util.Random.shuffle(ts).map(_.toUpperCase))
    }

  property("lsh band keys are deterministic and stay in their band's keyspace") =
    forAll(Gen.listOfN(256, Gen.chooseNum(0L, 50L))) { cs =>
      val cnt = new GenericArrayData(cs.toArray)
      val hmu = new GenericArrayData(Array.fill(192)(0.0))
      def keys = graft.functions.CorrUtil.bandKeys(cnt, hmu, 42L, 16, 12).toLongArray
      val k1 = keys
      k1.toSeq == keys.toSeq &&
        k1.zipWithIndex.forall { case (k, b) => (k >> 12) == b && (k & 0xfffL) >= 0 }
    }

  property("fixed-point units round-trip cents exactly") =
    forAll(Gen.chooseNum(-9999999L, 9999999L)) { cents =>
      val d = cents / 100.0
      Math.round(d * 100.0) == cents
    }

  // ---- q234 PAV kernel -------------------------------------------------

  private val pavBins: Gen[IndexedSeq[(Long, Long)]] =
    Gen.chooseNum(1, 12).flatMap { k =>
      Gen.listOfN(k, for {
        n <- Gen.chooseNum(1L, 50L)
        c <- Gen.chooseNum(0L, 50L).map(x => math.min(x, 50L))
      } yield (math.min(c, n), n)).map(_.toIndexedSeq)
    }

  /** O(n³) reference: merge the LEFTMOST adjacent violating pool pair
    * until none remains — the oracle's unrolled-CTE strategy. PAV's
    * fixpoint is unique, so the stack scan must land on it. */
  private def pavBrute(bins: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] = {
    var pools = bins.map { case (c, n) => (c, n, 1) } // (c, n, width)
    var merged = true
    while (merged) {
      merged = false
      val i = pools.indices.dropRight(1).find(j =>
        pools(j)._1 * pools(j + 1)._2 > pools(j + 1)._1 * pools(j)._2)
      i match {
        case Some(j) =>
          val (c1, n1, w1) = pools(j); val (c2, n2, w2) = pools(j + 1)
          pools = (pools.take(j) :+ ((c1 + c2, n1 + n2, w1 + w2))) ++
            pools.drop(j + 2)
          merged = true
        case None =>
      }
    }
    pools.flatMap { case (c, n, w) => Seq.fill(w)((c, n)) }
  }

  property("PAV stack scan equals the leftmost-merge fixpoint") =
    forAll(pavBins) { bins =>
      graft.ops.Causal.pavPool(bins) == pavBrute(bins)
    }

  property("PAV output rates are monotone nondecreasing (cross-multiplied)") =
    forAll(pavBins) { bins =>
      val out = graft.ops.Causal.pavPool(bins)
      out.zip(out.tail).forall { case ((c1, n1), (c2, n2)) =>
        c1 * n2 <= c2 * n1
      }
    }

  property("PAV is idempotent: pooling the pooled rates changes nothing") =
    forAll(pavBins) { bins =>
      val out = graft.ops.Causal.pavPool(bins)
      graft.ops.Causal.pavPool(out) == out
    }

  // ---- quantized prune kernel (q25/q35) --------------------------------

  private val S = graft.functions.CorrUtil.QuantScale.toDouble
  private def quantize(x: Array[Double]): Array[Short] = x.map { v =>
    val c = math.max(-1.0, math.min(1.0, v))
    math.round(c * S).toShort
  }
  private def dist2(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** (bound, a, b) with coords in [−1, 1] and b boundary-dense: half
    * the draws rescale b−a so the true distance lands within ±20 % of
    * √bound — the regime where an unsound threshold would misfire. */
  private val prunePair: Gen[(Double, Array[Double], Array[Double])] = for {
    m <- Gen.chooseNum(1, 96)
    bound <- Gen.oneOf(0.2001, 1.2001, 0.05, 2.0)
    a <- Gen.listOfN(m, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    b0 <- Gen.listOfN(m, Gen.chooseNum(-1.0, 1.0)).map(_.toArray)
    nearBoundary <- Gen.oneOf(true, false)
    scale <- Gen.chooseNum(0.8, 1.2)
  } yield {
    val b =
      if (!nearBoundary || dist2(a, b0) < 1e-12) b0
      else {
        val f = scale * math.sqrt(bound) / math.sqrt(dist2(a, b0))
        a.zip(b0).map { case (x, y) =>
          math.max(-1.0, math.min(1.0, x + (y - x) * f)) }
      }
    (bound, a, b)
  }

  property("quantized prune is SOUND: a fired prune implies true dist2 > bound") =
    forAll(prunePair) { case (bound, a, b) =>
      val t2 = graft.functions.CorrUtil.quantThreshold(bound, a.length)
      val fired =
        graft.functions.CorrUtil.projDistExceedsQ(quantize(a), quantize(b), t2)
      !fired || dist2(a, b) > bound
    }

  property("quantized prune FIRES outside the slack band (completeness)") =
    forAll(prunePair) { case (bound, a, b) =>
      val m = a.length
      val t2 = graft.functions.CorrUtil.quantThreshold(bound, m)
      val slackOut = math.sqrt(bound) + 2.0 * 1.0001 * math.sqrt(m.toDouble) / S
      val clearlyFar = dist2(a, b) > slackOut * slackOut * 1.000001
      !clearlyFar ||
        graft.functions.CorrUtil.projDistExceedsQ(quantize(a), quantize(b), t2)
    }

  property("degenerate sentinel and length mismatch never prune") =
    forAll(Gen.chooseNum(1, 96), Gen.chooseNum(0.01, 2.0)) { (m, bound) =>
      val t2 = graft.functions.CorrUtil.quantThreshold(bound, m)
      val full = Array.fill(m)(S.toInt.toShort)
      !graft.functions.CorrUtil.projDistExceedsQ(Array.empty[Short], full, t2) &&
        !graft.functions.CorrUtil.projDistExceedsQ(full, Array.empty[Short], t2) &&
        !graft.functions.CorrUtil
          .projDistExceedsQ(full, Array.fill(m + 1)(0.toShort), t2) &&
        (graft.functions.CorrUtil
          .quantThreshold(bound, 0) == Long.MaxValue)
    }

  // ---- q35 band-shape math (CorrDedup.bitsPerBand / bandsFor) ----

  property("bandsFor holds the per-pair miss bound for bits 16..24, minimally") =
    forAll(Gen.chooseNum(16, 24)) { bits =>
      val p = 1.0 - math.acos(graft.ops.CorrDedup.CorrThreshold) / math.Pi
      val miss1 = 1.0 - math.pow(p, bits) // per-band miss at threshold
      val bands = graft.ops.CorrDedup.bandsFor(bits)
      bands > 0 &&
        math.pow(miss1, bands) <= graft.ops.CorrDedup.MissBound &&
        math.pow(miss1, bands - 1) > graft.ops.CorrDedup.MissBound
    }

  property("bitsPerBand is monotone in n with floor 16 through 2^18") =
    forAll(Gen.chooseNum(0L, 1L << 40), Gen.chooseNum(0L, 1L << 40)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      graft.ops.CorrDedup.bitsPerBand(lo) <= graft.ops.CorrDedup.bitsPerBand(hi) &&
        graft.ops.CorrDedup.bitsPerBand(math.min(lo, 1L << 18)) == 16
    }

  // ---- q35 hot-bucket block split: the cell decomposition is exact ----

  // Mirror of the cell-emission expression in CorrDedup.corrNearDup:
  // member with group x lands in cells {(min(j,x), max(j,x)) : j < g},
  // side B iff j < x. A pair must be enumerated by EXACTLY one cell:
  // same-group pairs by their (x,x) triangle, cross-group pairs by the
  // one mixed cell (i,j) that pairs side A (group i) with side B
  // (group j) — the argument the distributed split's exactness (and
  // therefore q35's byte-identical hashes at any scale) rests on.
  property("block-split cells enumerate every bucket pair exactly once") =
    forAll(Gen.chooseNum(2, 40), Gen.chooseNum(2, 8), Gen.long) { (c, g, salt) =>
      def grp(m: Int): Int = math.floorMod(m.toLong * 2654435761L + salt, g).toInt
      val pairs = scala.collection.mutable.Map.empty[(Int, Int), Int]
      for (a <- 0 until c; b <- a + 1 until c) {
        val (xa, xb) = (grp(a), grp(b))
        // which cells contain BOTH a and b on pairable sides?
        var hits = 0
        for (j <- 0 until g) {
          val cellA = (math.min(j, xa), math.max(j, xa))
          for (k <- 0 until g) {
            val cellB = (math.min(k, xb), math.max(k, xb))
            if (cellA == cellB) {
              val sa = if (j < xa) 1 else 0
              val sb = if (k < xb) 1 else 0
              // triangle cells ((i,i)) pair all side-0 members once;
              // mixed cells pair A with B only
              if (cellA._1 == cellA._2) { if (sa == 0 && sb == 0) hits += 1 }
              else if (sa != sb) hits += 1
            }
          }
        }
        pairs((a, b)) = hits
      }
      pairs.values.forall(_ == 1)
    }
}
