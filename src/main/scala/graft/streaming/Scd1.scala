package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
  */
object Scd1 {

  final case class Change(
      key: Long, version: Long, payload: String, change_type: String)
  final case class CurrentRow(
      key: Long, version: Long, payload: String, deleted: Boolean)

  /** Update-mode per-key current state via mapGroupsWithState: each
    * micro-batch emits the post-batch state of every key it touched. */
  def currentState(spark: SparkSession,
      changes: Dataset[Change]): Dataset[CurrentRow] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[CurrentRow, CurrentRow](GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Change], state: GroupState[CurrentRow]) =>
          // apply the batch's changes version-ascending on top of state;
          // pre-images never apply
          val next = batch.toSeq
            .filter(_.change_type != "update_preimage")
            .sortBy(_.version)
            .foldLeft(state.getOption) { (cur, c) =>
              if (cur.exists(_.version > c.version)) cur
              else Some(CurrentRow(key, c.version, c.payload,
                deleted = c.change_type == "delete"))
            }
          next.foreach(state.update)
          next.getOrElse(CurrentRow(key, -1L, null, deleted = true))
      }
  }
}
