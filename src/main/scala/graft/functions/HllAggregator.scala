package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch as a typed `Aggregator` — the
  * user-facing aggregate extension point (SURVEY.md §7.1's stretch
  * item). Dense 2^p byte registers; XXH64 row hashing, so the sketch is
  * fully deterministic: reduce updates a register max, merge is an
  * element-wise max (commutative + associative), and therefore the
  * estimate is identical under any partitioning — the property that
  * lets one 4 KiB buffer per group replace a shuffle of raw keys at
  * 100 TB. Standard bias-corrected estimator with the small-range
  * linear-counting correction.
  */
class HllAggregator(p: Int = 12) extends Aggregator[Long, Array[Byte], Long] {
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], x: Long): Array[Byte] = {
    val h = XXH64.hashLong(x, 0L)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllAggregator {
  /** Column API: approx-distinct of a long column via the sketch. */
  def hllDistinct(c: Column, p: Int = 12): Column =
    udaf(new HllAggregator(p), Encoders.scalaLong).apply(c)
}
