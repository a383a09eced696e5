package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Batch CDF apply: a deterministic change feed modeled from `orders`
  * (each order row = one change event for its customer key, the order
  * key as the monotone `_commit_version`, a status/key-derived
  * `_change_type` mix of inserts, updates, pre-images and deletes),
  * resolved to current state by [[Streams.scd1Apply]].
  *
  * This is the SQL-expressible twin of the streaming Scd1 operator:
  * per-key argmax on the version with delete suppression, so the
  * oracle can hash-check the full change-application semantics —
  * including keys whose latest change is a delete (absent from the
  * output) and pre-image rows (never applied).
  */
object ChangeFeed {

  def modeledChanges(orders: DataFrame): DataFrame =
    orders.select(
      col("o_custkey").as("customer_id"),
      col("o_orderkey").as("_commit_version"),
      when(col("o_orderkey") % 11 === 0, "delete")
        .when(col("o_orderstatus") === "O", "insert")
        .when(col("o_orderkey") % 13 === 0, "update_preimage")
        .otherwise("update_postimage").as("_change_type"),
      col("o_totalprice").as("total_due"),
      col("o_orderpriority").as("priority"))

  def q40CdfScd1(spark: SparkSession, dir: String): DataFrame =
    Streams.scd1Apply(modeledChanges(Tables.load(spark, dir, "orders")),
        keyCols = Seq("customer_id"))
      .select(col("customer_id"),
        col("_commit_version").as("last_version"),
        col("_change_type").as("last_change"),
        col("total_due"), col("priority"))

  val q40Oracle: String =
    """WITH changes AS (
      |  SELECT o_custkey AS customer_id, o_orderkey AS version,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'delete'
      |         WHEN o_orderstatus = 'O' THEN 'insert'
      |         WHEN o_orderkey % 13 = 0 THEN 'update_preimage'
      |         ELSE 'update_postimage' END AS change_type,
      |    o_totalprice AS total_due, o_orderpriority AS priority
      |  FROM orders
      |), resolved AS (
      |  SELECT *, row_number() OVER (PARTITION BY customer_id
      |                               ORDER BY version DESC) AS rk
      |  FROM changes WHERE change_type <> 'update_preimage')
      |SELECT customer_id, version AS last_version, change_type AS last_change,
      |  total_due, priority
      |FROM resolved WHERE rk = 1 AND change_type <> 'delete'""".stripMargin

  /** q86: SCD-TYPE-2 history build from the same modeled change feed —
    * the other half of the slowly-changing-dimension pair (q40 = SCD-1
    * current state). Every applied change (insert / post-image /
    * delete) becomes a versioned history row; `version_to` closes it
    * at the key's next change (`lead` over a per-key window — state
    * bounded by each key's change count, never corpus-wide); the open
    * row is current unless the key's last change was a delete.
    *
    * Scale: one shuffle on the key for the per-key ordered window —
    * the same cost class as the SCD-1 argmax, and the standard plan
    * for dimension-history rebuilds. */
  def q86Scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val applied = modeledChanges(Tables.load(spark, dir, "orders"))
      .filter(col("_change_type") =!= "update_preimage")
    val w = Window.partitionBy(col("customer_id")).orderBy(col("_commit_version"))
    applied
      .withColumn("version_to", lead(col("_commit_version"), 1).over(w))
      .select(col("customer_id"),
        col("_commit_version").as("version_from"),
        col("version_to"),
        (col("version_to").isNull && col("_change_type") =!= "delete")
          .as("is_current"),
        col("_change_type").as("change_type"),
        col("total_due"), col("priority"))
  }

  val q86Oracle: String =
    """WITH changes AS (
      |  SELECT o_custkey AS customer_id, o_orderkey AS version,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'delete'
      |         WHEN o_orderstatus = 'O' THEN 'insert'
      |         WHEN o_orderkey % 13 = 0 THEN 'update_preimage'
      |         ELSE 'update_postimage' END AS change_type,
      |    o_totalprice AS total_due, o_orderpriority AS priority
      |  FROM orders
      |), applied AS (
      |  SELECT * FROM changes WHERE change_type <> 'update_preimage'
      |), hist AS (
      |  SELECT customer_id, version AS version_from,
      |    lead(version) OVER (PARTITION BY customer_id ORDER BY version)
      |      AS version_to,
      |    change_type, total_due, priority
      |  FROM applied)
      |SELECT customer_id, version_from, version_to,
      |  (version_to IS NULL AND change_type <> 'delete') AS is_current,
      |  change_type, total_due, priority
      |FROM hist""".stripMargin

  /** q87: incremental aggregate maintenance — the production pattern
    * that makes a 100 TB nightly aggregate affordable: yesterday's
    * materialized per-key aggregate (modeled: orders with key % 7 ≠ 0)
    * is MERGED with the aggregate of today's delta (key % 7 = 0) by a
    * full-outer co-partitioned join + component-wise addition, instead
    * of rescanning the base table. Counts and integer-cent sums are
    * the mergeable components (commutative monoids — the same property
    * that makes map-side combine work). The oracle recomputes from the
    * full table: incremental merge ≡ full recompute IS the check. */
  def q87IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cents = expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey").as("customer_id"))
        .agg(count(lit(1)).as("n_orders"), sum(cents).as("total_cents"))
    val base = aggOf(orders.filter(col("o_orderkey") % 7 =!= 0)).as("b")
    val delta = aggOf(orders.filter(col("o_orderkey") % 7 === 0)).as("d")
    base.join(delta, Seq("customer_id"), "full_outer")
      .select(col("customer_id"),
        (coalesce(col("b.n_orders"), lit(0L)) +
          coalesce(col("d.n_orders"), lit(0L))).as("n_orders"),
        (coalesce(col("b.total_cents"), lit(0L)) +
          coalesce(col("d.total_cents"), lit(0L))).as("total_cents"))
  }

  val q87Oracle: String =
    """SELECT o_custkey AS customer_id, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders
      |GROUP BY 1""".stripMargin

  /** q94: snapshot diff — CDC *generation*, the inverse of the CDF
    * *apply* (q40): given two key-complete snapshots of a table,
    * compute the change set (insert / delete / update + payload) that
    * turns the old one into the new one — what you run when the
    * upstream can't emit a change feed and you must derive one from
    * daily snapshot drops. Modeled snapshots from orders: old = keys
    * with `o_orderkey % 7 ≠ 0`, new = keys with `% 11 ≠ 0` and the
    * price re-stated (+10 %) where `% 3 = 0`, so all three change
    * types occur and most keys are unchanged (dropped from the diff —
    * the dominant case at 100 TB, which is why the diff output is tiny
    * relative to its input).
    *
    * Plan: ONE full-outer co-partitioned join on the key; the
    * unchanged-row test compares the integer cent payload (exact —
    * comparing raw doubles an engine re-derived would be the q30
    * divergence trap). Both snapshot scans prune to (key, payload)
    * columns. At 100 TB this is two table scans + one shuffle each —
    * the minimum any snapshot differ can do. */
  def q94SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cents = expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
    val old = orders.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("key"), cents.as("old_cents"))
    val neu = orders.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("key"),
        when(col("o_orderkey") % 3 === 0,
          (cents * 110L / lit(100L)).cast("long")).otherwise(cents)
          .as("new_cents"))
    old.join(neu, Seq("key"), "full_outer")
      .withColumn("change_type",
        when(col("old_cents").isNull, "insert")
          .when(col("new_cents").isNull, "delete")
          .when(col("old_cents") =!= col("new_cents"), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(col("key"), col("change_type"), col("old_cents"), col("new_cents"))
  }

  val q94Oracle: String =
    """WITH old AS (
      |  SELECT o_orderkey AS key,
      |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS old_cents
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |), neu AS (
      |  SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 3 = 0
      |      THEN CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) * 110 // 100
      |           AS BIGINT)
      |      ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END AS new_cents
      |  FROM orders WHERE o_orderkey % 11 <> 0
      |), diff AS (
      |  SELECT coalesce(o.key, n.key) AS key, o.old_cents, n.new_cents,
      |    CASE WHEN o.key IS NULL THEN 'insert'
      |         WHEN n.key IS NULL THEN 'delete'
      |         WHEN o.old_cents <> n.new_cents THEN 'update'
      |         ELSE 'unchanged' END AS change_type
      |  FROM old o FULL OUTER JOIN neu n ON o.key = n.key)
      |SELECT key, change_type, old_cents, new_cents
      |FROM diff WHERE change_type <> 'unchanged'""".stripMargin

  /** q110: POINT-IN-TIME lookup against the slowly-changing dimension —
    * "what did this customer's dimension row look like as of version
    * v?" for every probe, the query a temporal star schema answers on
    * every fact load (and the batch analog of a stream-static temporal
    * join). Probes are the orders themselves: each order asks for the
    * dimension state as of its own commit version.
    *
    * Plan — the AS-OF UNION TRICK, not a range join: a naive
    * `version_from <= v < version_to` theta-join explodes into
    * (probes × versions-per-key) candidate pairs and denies the
    * optimizer an equi-key; instead, applied changes and probes union
    * into ONE stream, sorted per key by (version, change-before-probe),
    * and `last(ignoreNulls)` carries each change's payload forward to
    * the probes that follow it. One shuffle on the key; each window
    * task sorts exactly one key's changes + probes — the same bounded
    * state class as q86's history build. A probe that lands before the
    * key's first change, or after a delete, resolves to an absent
    * dimension (all-null attributes) — SCD-correct, where a plain
    * as-of join (q29) would happily serve a deleted row.
    *
    * The tie rule (change sorts before probe at equal version) makes a
    * change visible to a probe at its own version — matching the SCD-2
    * convention that `version_from` is inclusive. */
  def q110PitLookup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, dir, "orders")
    val applied = modeledChanges(orders)
      .filter(col("_change_type") =!= "update_preimage")
      .select(col("customer_id"), col("_commit_version").as("v"),
        lit(0).as("is_probe"),
        col("_commit_version").as("dv"), col("_change_type").as("dc"),
        col("total_due").as("dt"), col("priority").as("dp"))
    val probes = orders.select(col("o_custkey").as("customer_id"),
      col("o_orderkey").as("v"), lit(1).as("is_probe"),
      lit(null).cast("long").as("dv"), lit(null).cast("string").as("dc"),
      lit(null).cast("double").as("dt"), lit(null).cast("string").as("dp"))
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("v").asc, col("is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    applied.unionByName(probes)
      .withColumn("cdv", last(col("dv"), ignoreNulls = true).over(w))
      .withColumn("cdc", last(col("dc"), ignoreNulls = true).over(w))
      .withColumn("cdt", last(col("dt"), ignoreNulls = true).over(w))
      .withColumn("cdp", last(col("dp"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("customer_id"), col("v").as("probe_version"),
        when(col("cdc") === "delete", lit(null).cast("long"))
          .otherwise(col("cdv")).as("dim_version"),
        when(col("cdc") === "delete", lit(null).cast("double"))
          .otherwise(col("cdt")).as("dim_total_due"),
        when(col("cdc") === "delete", lit(null).cast("string"))
          .otherwise(col("cdp")).as("dim_priority"))
  }

  val q110Oracle: String =
    """WITH changes AS (
      |  SELECT o_custkey AS customer_id, o_orderkey AS version,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'delete'
      |         WHEN o_orderstatus = 'O' THEN 'insert'
      |         WHEN o_orderkey % 13 = 0 THEN 'update_preimage'
      |         ELSE 'update_postimage' END AS change_type,
      |    o_totalprice AS total_due, o_orderpriority AS priority
      |  FROM orders
      |), u AS (
      |  SELECT customer_id, version AS v, 0 AS is_probe,
      |    version AS dv, change_type AS dc, total_due AS dt, priority AS dp
      |  FROM changes WHERE change_type <> 'update_preimage'
      |  UNION ALL
      |  SELECT o_custkey, o_orderkey, 1, NULL, NULL, NULL, NULL FROM orders
      |), carried AS (
      |  SELECT customer_id, v, is_probe,
      |    last_value(dv IGNORE NULLS) OVER w AS cdv,
      |    last_value(dc IGNORE NULLS) OVER w AS cdc,
      |    last_value(dt IGNORE NULLS) OVER w AS cdt,
      |    last_value(dp IGNORE NULLS) OVER w AS cdp
      |  FROM u
      |  WINDOW w AS (PARTITION BY customer_id ORDER BY v ASC, is_probe ASC
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT customer_id, v AS probe_version,
      |  CASE WHEN cdc = 'delete' THEN NULL ELSE cdv END AS dim_version,
      |  CASE WHEN cdc = 'delete' THEN NULL ELSE cdt END AS dim_total_due,
      |  CASE WHEN cdc = 'delete' THEN NULL ELSE cdp END AS dim_priority
      |FROM carried WHERE is_probe = 1""".stripMargin

  /** q197: incremental aggregate maintenance WITH RETRACTIONS — q87's
    * missing half. q87 merges an insert-only delta; production change
    * feeds also carry deletes and updates, and the aggregate must
    * retract: per group, Δcount = +1 per insert − 1 per delete, and
    * Δsum = Σ(new − old) with the absent side as 0. Counts and
    * integer-cent sums form an abelian GROUP (not just a monoid — every
    * element has an inverse), which is exactly the property that makes
    * delete/update maintenance possible without rescanning the base;
    * max/min would NOT be maintainable this way.
    *
    * Pipeline: the OLD snapshot's per-customer aggregate (the stored
    * materialization this models) + the q94 snapshot diff re-keyed to
    * the customer, merged by one full-outer co-partitioned join.
    * Groups whose membership retracts to zero drop out of the view.
    * The oracle aggregates the NEW snapshot directly — incremental
    * maintenance ≡ full recompute is the whole check. At 100 TB the
    * plan reads the base AGGREGATE (group-count-sized) and the delta
    * (change-sized), never the base table: the difference between a
    * 10-minute and a 10-hour nightly build. */
  def q197RetractAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cents = expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
    val old = orders.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        cents.as("old_cents"))
    val neu = orders.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust2"),
        when(col("o_orderkey") % 3 === 0,
          (cents * 110L / lit(100L)).cast("long")).otherwise(cents)
          .as("new_cents"))
    // the q94 diff, keeping the group key from whichever side exists
    val changes = old
      .join(neu.withColumnRenamed("key", "nkey"),
        col("key") === col("nkey"), "full_outer")
      .select(coalesce(col("cust"), col("cust2")).as("customer_id"),
        when(col("old_cents").isNull, lit(1L))
          .when(col("new_cents").isNull, lit(-1L))
          .otherwise(lit(0L)).as("dn"),
        (coalesce(col("new_cents"), lit(0L)) -
          coalesce(col("old_cents"), lit(0L))).as("dc"))
      .filter(col("dn") =!= 0L || col("dc") =!= 0L)
    val baseAgg = old.groupBy(col("cust").as("customer_id"))
      .agg(count(lit(1)).as("n_orders"), sum(col("old_cents")).as("total_cents"))
    val deltaAgg = changes.groupBy(col("customer_id"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    baseAgg.as("b").join(deltaAgg.as("d"), Seq("customer_id"), "full_outer")
      .select(col("customer_id"),
        (coalesce(col("b.n_orders"), lit(0L)) +
          coalesce(col("d.dn"), lit(0L))).as("n_orders"),
        (coalesce(col("b.total_cents"), lit(0L)) +
          coalesce(col("d.dc"), lit(0L))).as("total_cents"))
      .filter(col("n_orders") > 0L)
  }

  val q197Oracle: String =
    """SELECT o_custkey AS customer_id, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN o_orderkey % 3 = 0
      |    THEN CAST(round(o_totalprice * 100.0) AS BIGINT) * 110 // 100
      |    ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END)
      |    AS BIGINT) AS total_cents
      |FROM orders WHERE o_orderkey % 11 <> 0
      |GROUP BY 1""".stripMargin
}
