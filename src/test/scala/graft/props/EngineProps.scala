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

  property("fixed-point units round-trip cents exactly") =
    forAll(Gen.chooseNum(-9999999L, 9999999L)) { cents =>
      val d = cents / 100.0
      Math.round(d * 100.0) == cents
    }
}
