package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q111: order-independent bucketed table checksums — the
  * replica-reconciliation primitive. Verifying that two copies of a
  * 100 TB table agree cannot afford a global sort-and-diff; the
  * standard answer is a content checksum that is (a) insensitive to
  * row order and partitioning, (b) mergeable (partial checksums XOR
  * together — the same monoid property that lets map-side combine
  * run), and (c) bucketed, so a mismatch localizes to 1/64th of the
  * key space instead of "somewhere in the table" (the flat version of
  * a Merkle tree level).
  *
  * Each row renders to a canonical string of ENGINE-STABLE fields —
  * integers, strings, epoch milliseconds, integer cents — never raw
  * doubles, whose shortest-round-trip formatting differs across
  * engines (the q16 fingerprint lesson). The row hash is the first 15
  * md5 nibbles as a 60-bit integer; per bucket (hash mod 64) the
  * table publishes its row count and the XOR of its hashes. XOR
  * cancels duplicate PAIRS of identical rows — which is why the count
  * rides along: a cancellation that preserves the count requires two
  * simultaneous collisions, and rows here carry their primary keys so
  * identical rows do not occur.
  *
  * Plan: one scan per table, a codegen'd projection to the hash, and
  * a 64-row hash aggregate — nothing shuffles but 64 partial states
  * per partition.
  */
object Integrity {

  val Buckets = 64

  /** Bucketed XOR checksum of `rowStr` (a canonical, engine-stable
    * rendering of the row). Exposed for spec-level frames. */
  def bucketChecksum(df: DataFrame, rowStr: Column, table: String): DataFrame =
    df
      .select(conv(substring(md5(rowStr), 1, 15), 16, 10)
        .cast("long").as("_hv"))
      .groupBy((col("_hv") % Buckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_hv)").as("checksum"))
      .select(lit(table).as("table_name"), col("bucket"),
        col("n_rows"), col("checksum"))

  def q111TableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val orders = bucketChecksum(Tables.load(spark, dir, "orders"),
      concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), Exact.units(col("o_totalprice"), 2),
        unix_millis(col("o_orderdate").cast("timestamp")),
        col("o_orderpriority")),
      "orders")
    val customer = bucketChecksum(Tables.load(spark, dir, "customer"),
      concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
        Exact.units(col("c_acctbal"), 2), col("c_mktsegment")),
      "customer")
    val lineitem = bucketChecksum(Tables.load(spark, dir, "lineitem"),
      concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity").cast("long"),
        Exact.units(col("l_extendedprice"), 2),
        Exact.units(col("l_discount"), 2), Exact.units(col("l_tax"), 2),
        col("l_returnflag"), col("l_linestatus"),
        unix_millis(col("l_shipdate").cast("timestamp"))),
      "lineitem")
    orders.unionByName(customer).unionByName(lineitem)
  }

  /** 15-nibble md5 prefix as a BIGINT, DuckDB-side (the q49/q68
    * strpos-nibble idiom; DuckDB has no hex→int conv()). */
  private def nibbleSql(hexExpr: String): String =
    (0 until 15).map { j =>
      val w = BigInt(16).pow(14 - j)
      s"(strpos('0123456789abcdef', substring($hexExpr, ${j + 1}, 1)) - 1) * $w"
    }.mkString(" + ")

  private def tableSql(table: String, rowStr: String): String =
    s"""SELECT '$table' AS table_name, hv % $Buckets AS bucket,
       |  count(*) AS n_rows, CAST(bit_xor(hv) AS BIGINT) AS checksum
       |FROM (
       |  SELECT ${nibbleSql("h")} AS hv FROM (
       |    SELECT md5($rowStr) AS h FROM $table))
       |GROUP BY 1, 2""".stripMargin

  val q111Oracle: String = Seq(
    tableSql("orders",
      """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
        |      CAST(round(o_totalprice * 100.0) AS BIGINT),
        |      epoch_ms(o_orderdate), o_orderpriority)""".stripMargin),
    tableSql("customer",
      """concat_ws('|', c_custkey, c_name, c_nationkey,
        |      CAST(round(c_acctbal * 100.0) AS BIGINT), c_mktsegment)""".stripMargin),
    tableSql("lineitem",
      """concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |      CAST(l_quantity AS BIGINT),
        |      CAST(round(l_extendedprice * 100.0) AS BIGINT),
        |      CAST(round(l_discount * 100.0) AS BIGINT),
        |      CAST(round(l_tax * 100.0) AS BIGINT),
        |      l_returnflag, l_linestatus, epoch_ms(l_shipdate))""".stripMargin))
    .mkString("\nUNION ALL\n")
  /** The FK edges of the TPC-H-ish catalog q132 audits: (label, child
    * table, fk column, parent table, pk column). */
  private val FkEdges = Seq(
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"))

  /** q132: referential-integrity audit — for every FK edge of the
    * catalog, the child row count, the number of orphan rows (child
    * rows whose FK matches no parent key) and the number of distinct
    * orphan KEYS. The data-contract check every ingest gate runs.
    * Plan per edge: the child is projected to its key column at the
    * scan (ReadSchema is one column), orphan keys come from a
    * DISTINCT-then-anti-join (the anti join probes distinct keys, not
    * rows), and the orphan ROW count joins those keys back to the
    * keys-only child projection — nothing wide ever shuffles. A
    * healthy catalog reports zeros; the oracle proves both engines
    * agree on exactly that. */
  def q132FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val perEdge = FkEdges.map { case (label, child, fk, parent, pk) =>
      val ch = Tables.load(spark, dir, child)
        .select(col(fk).as("k")).where(col("k").isNotNull)
      val par = Tables.load(spark, dir, parent)
        .select(col(pk).as("k")).distinct()
      val orphanKeys = ch.distinct()
        .join(par, Seq("k"), "left_anti")
      val stats = ch
        .join(orphanKeys.withColumn("_o", lit(1L)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("_o").isNotNull, 1L).otherwise(0L)).as("n_orphans"))
      val keyCount = orphanKeys.agg(count(lit(1)).as("n_orphan_keys"))
      stats.crossJoin(keyCount)
        .select(lit(label).as("fk_edge"), col("n_rows"),
          col("n_orphans"), col("n_orphan_keys"))
    }
    perEdge.reduce(_ unionByName _)
  }

  val q132Oracle: String = FkEdges.map { case (label, child, fk, parent, pk) =>
    s"""SELECT '$label' AS fk_edge,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(*) FILTER (WHERE NOT EXISTS (
       |    SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS BIGINT)
       |    AS n_orphans,
       |  CAST(count(DISTINCT $fk) FILTER (WHERE NOT EXISTS (
       |    SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS BIGINT)
       |    AS n_orphan_keys
       |FROM $child c WHERE c.$fk IS NOT NULL""".stripMargin
  }.mkString("\nUNION ALL\n")
}
