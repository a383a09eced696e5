package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming heavy hitters via sharded Space-Saving (Metwally,
  * Agrawal & El Abbadi 2005) — the deterministic counter-based
  * companion to the CMS stream twin ([[SketchStream]]): where CMS
  * answers point frequency queries probabilistically, Space-Saving
  * maintains the candidate top-k SET itself with hard deterministic
  * guarantees, from bounded state:
  *
  *   - at most `m` counters live per shard, however long the stream
  *     runs (the 100 TB streaming-state requirement);
  *   - every item with true shard count > N_shard/m is guaranteed
  *     present in its shard's summary (no false negatives above the
  *     threshold);
  *   - each reported estimate obeys true ≤ est ≤ true + err, with
  *     err the recorded over-estimation bound per counter.
  *
  * Sharding is by hash of the item — each item lives in EXACTLY one
  * shard, so shard summaries never double-count and the global
  * summary is their plain union: P shards × m counters of total
  * state, and the per-shard guarantee (count > N_shard/m surfaces)
  * implies the global one (count > N/m surfaces, since an item's
  * full count sits in one shard). This is the standard distributed
  * deployment of the algorithm: the sequential stream-summary
  * structure parallelizes by PARTITIONING THE KEY SPACE, not by
  * merging overlapping sketches (Space-Saving merge loses the
  * deterministic bound; key-space sharding keeps it).
  *
  * When a shard sees ≤ m distinct items, eviction never fires and the
  * counts are EXACT — so on such inputs the stream twin is
  * bit-equal to the batch groupBy count whatever the micro-batch
  * cuts (HeavyStreamSpec pins it). Past capacity the summary is
  * arrival-order dependent BY DESIGN (as the algorithm is); the spec
  * then asserts the deterministic bounds instead of bit equality.
  */
object HeavyStream {

  case class Item(shard: Int, item: String)
  case class Counter(item: String, est: Long, err: Long)
  case class ShardSummary(shard: Int, counters: Seq[Counter])

  /** Space-Saving over (shard, item) rows: keyed
    * `mapGroupsWithState` with ≤ `m` counters per shard. Works on
    * batch and streaming frames; on a stream run with
    * OutputMode.Update. The per-item eviction scan is O(m) worst
    * case — m is a small constant (the stream-summary linked-list
    * structure would make it O(1); at m ≤ a few hundred the scan is
    * cheaper than the pointer chasing). */
  def summaries(rows: DataFrame, m: Int): Dataset[ShardSummary] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("shard"), col("item")).as[Item]
      .groupByKey(_.shard)
      .mapGroupsWithState[Map[String, (Long, Long)], ShardSummary](
        GroupStateTimeout.NoTimeout) { (shard, it, state) =>
        val ctr = scala.collection.mutable.Map.empty[String, (Long, Long)]
        state.getOption.foreach(ctr ++= _)
        it.foreach { r =>
          ctr.get(r.item) match {
            case Some((c, e)) => ctr(r.item) = (c + 1, e)
            case None if ctr.size < m => ctr(r.item) = (1L, 0L)
            case None =>
              // evict the min-estimate counter; ties broken by item
              // string so replay of the same arrival order is stable
              val (minItem, (minC, _)) =
                ctr.minBy { case (k, (c, _)) => (c, k) }
              ctr -= minItem
              ctr(r.item) = (minC + 1, minC)
          }
        }
        val snap = ctr.toMap
        state.update(snap)
        ShardSummary(shard, snap.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
          .map { case (k, (c, e)) => Counter(k, c, e) })
      }
  }

  /** Shard assignment: non-negative hash of the item mod `shards` —
    * the same expression batch or streaming, so the twin comparison
    * feeds both sides identically. */
  def sharded(items: DataFrame, itemCol: String, shards: Int): DataFrame =
    items.select(pmod(hash(col(itemCol)), lit(shards)).cast("int").as("shard"),
      col(itemCol).cast("string").as("item"))
}
