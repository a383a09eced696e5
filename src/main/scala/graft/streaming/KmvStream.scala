package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming KMV register maintenance — q156's k-minimum-values
  * sketch as LIVE STATE, completing the sketch-stream trio (HLL max
  * registers, CMS count cells, KMV min-k sets). The state per source
  * is the ≤ K smallest distinct content hashes seen so far — a
  * bounded buffer however long the stream runs, and the merge
  * (set-union then re-take the k smallest) is associative,
  * commutative, and idempotent, so the final state is INDEPENDENT of
  * how the stream was cut into micro-batches or how replays
  * duplicate rows (StreamingSketchSpec pins it bit-equal to the
  * batch q156 register).
  *
  * Unlike HLL/CMS this is not a per-cell monoid a declarative
  * groupBy can maintain (the k slots interact), so it runs as a
  * keyed [[org.apache.spark.sql.KeyValueGroupedDataset
  * .mapGroupsWithState]] with explicit ≤K-element state — the
  * custom-state tool the build plan reserves for exactly this case.
  */
object KmvStream {

  case class KmvRow(source: String, h15: String)
  case class KmvRegister(source: String, register: Seq[String])

  /** Works on batch AND streaming frames carrying (source, h15).
    * On a stream run with OutputMode.Update; each micro-batch emits
    * the keys it touched with their updated register. */
  def registers(rows: DataFrame, k: Int = graft.ops.Kmv.K): Dataset[KmvRegister] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("source"), col("h15")).as[KmvRow]
      .groupByKey(_.source)
      .mapGroupsWithState[Seq[String], KmvRegister](GroupStateTimeout.NoTimeout) {
        (src, it, state) =>
          // Fold the batch incrementally into a size-capped sorted set:
          // peak memory is O(k) per key regardless of micro-batch size
          // (a hot key's rows never materialize as one buffer).
          val set = scala.collection.mutable.TreeSet.empty[String]
          state.getOption.getOrElse(Seq.empty).foreach(set += _)
          it.foreach { r =>
            if (set.size < k) set += r.h15
            else if (r.h15 < set.max && !set.contains(r.h15)) {
              set -= set.max; set += r.h15
            }
          }
          val merged = set.toSeq
          state.update(merged)
          KmvRegister(src, merged)
      }
  }
}
