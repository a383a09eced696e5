package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD-1: maintain each key's current dimension row from a
  * row-level change stream (the dim_customer CDF consumption,
  * sales_aw_silver_layer_dim_customer.py:10-16, upgraded from
  * "filter to post-images" to full change semantics).
  *
  * State is one row per live key — the dimension's own cardinality,
  * the minimum any current-state operator can hold. Version resolution
  * makes the operator idempotent under replays and robust to
  * out-of-order micro-batches: a change only applies if its
  * `_commit_version` is not behind the state's. Deletes are APPLIED,
  * not dropped — the emitted tombstone (`deleted = true`) is what a
  * downstream merge uses to remove the row.
  *
  * Determinism contract (shared with [[Streams.scd1Apply]]): a feed
  * carries at most one change per (key, version, change_type); equal
  * versions resolve by change-type rank delete > update_postimage >
  * insert, so the streaming fold and the batch window agree on feeds
  * that compact several change types into one commit version.
  */
object Scd1 {

  final case class Change(
      key: Long, version: Long, payload: String, change_type: String)
  final case class CurrentRow(
      key: Long, version: Long, payload: String, deleted: Boolean)

  private def rank(changeType: String): Int = changeType match {
    case "delete"           => 2
    case "update_postimage" => 1
    case _                  => 0
  }

  /** A stored row's rank when compared against a same-version incoming
    * change: tombstones keep delete rank; a live row is an applied
    * image (rank 1) regardless of whether it arrived as insert or
    * postimage — so a same-version postimage still refreshes it while
    * a same-version insert cannot regress it. */
  private def stateRank(row: CurrentRow): Int = if (row.deleted) 2 else 1

  /** Update-mode per-key current state via flatMapGroupsWithState: each
    * micro-batch emits the post-batch state of every key it touched.
    * A batch that carries only pre-images for an unseen key emits
    * NOTHING (no state write either) — fabricating a tombstone here
    * would make a downstream merge delete a key that never existed. */
  def currentState(spark: SparkSession,
      changes: Dataset[Change]): Dataset[CurrentRow] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[CurrentRow, CurrentRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Change], state: GroupState[CurrentRow]) =>
          // apply the batch's changes (version, rank)-ascending on top
          // of state; pre-images never apply
          val next = batch.toSeq
            .filter(_.change_type != "update_preimage")
            .sortBy(c => (c.version, rank(c.change_type)))
            .foldLeft(state.getOption) { (cur, c) =>
              val behind = cur.exists(v => v.version > c.version ||
                (v.version == c.version && stateRank(v) > rank(c.change_type)))
              if (behind) cur
              else Some(CurrentRow(key, c.version, c.payload,
                deleted = c.change_type == "delete"))
            }
          next.foreach(state.update)
          next.iterator
      }
  }
}
