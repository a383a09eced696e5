package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salting.
  *
  * When one join key dominates (a hot user, a null-ish default key), the
  * task holding that key becomes the straggler and no partition count
  * fixes it. Salting splits each hot key into `salts` sub-keys: the big
  * side gets a random salt per row, the small side is replicated once
  * per salt value, and the join key becomes (key, salt) — the hot key's
  * rows spread over `salts` tasks. AQE's skew-join handles sort-merge
  * cases adaptively; explicit salting remains the tool when AQE can't
  * split (e.g. aggregations after the join, or deterministic layouts).
  */
object SkewJoin {

  /** Equi-join `big ⨝ small` on `key`, salted `salts` ways. The salt on
    * the big side is deterministic (hash of all columns mod salts) so
    * results are reproducible; distribution quality only needs
    * approximate uniformity. */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    val out = saltedBig.join(saltedSmall,
      saltedBig(key) === saltedSmall(key) && saltedBig("_salt") === saltedSmall("_salt"),
      joinType)
    // drop the salt and the duplicated key column from the small side
    val keep: Seq[Column] =
      big.columns.map(saltedBig(_)).toIndexedSeq ++
        small.columns.filterNot(_ == key).map(saltedSmall(_)).toIndexedSeq
    out.select(keep: _*)
  }
}
