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

  /** q112: join-skew advisor — the diagnostic that decides WHEN the
    * salting above (q91) is worth its replication cost. For each
    * candidate join key it measures, in exact integers: total rows,
    * distinct keys, the hottest key's row count and identity, and the
    * recommended salt fan-out ⌈max/avg⌉ (the factor that levels the
    * hottest task down to the mean). salt_factor 1 = don't salt.
    *
    * Plan: one count-per-key aggregate (map-side combinable), then two
    * CONSTANT-sized reductions over the counts — the overall stats row
    * and the hot-key argmin — joined as 1-row broadcasts. No global
    * window over the counts, no collect of anything key-sized; at
    * 100 TB this is the same plan you'd run ahead of the production
    * join it advises. */
  def skewAdvisor(df: DataFrame, keyCol: String, table: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("c")).as("max_rows_per_key"))
    val hot = counts
      .crossJoin(broadcast(stats.select(col("max_rows_per_key").as("_mc"))))
      .filter(col("c") === col("_mc"))
      .agg(min(col("k")).as("hot_key"))
    stats.crossJoin(broadcast(hot))
      .select(lit(table).as("table_name"), lit(keyCol).as("column_name"),
        col("n_rows"), col("n_keys"), col("max_rows_per_key"),
        col("hot_key"),
        expr("(max_rows_per_key * n_keys + n_rows - 1) div n_rows")
          .as("salt_factor"))
  }

  /** The candidate join keys of the star schema + event feed. */
  val AdvisedKeys: Seq[(String, String)] = Seq(
    "orders" -> "o_custkey", "lineitem" -> "l_orderkey",
    "lineitem" -> "l_partkey", "lineitem" -> "l_suppkey",
    "events" -> "user_id")

  def q112SkewAdvisor(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    AdvisedKeys.map { case (t, k) =>
      skewAdvisor(graft.Tables.load(spark, dir, t), k, t)
    }.reduce(_ unionByName _)

  val q112Oracle: String =
    AdvisedKeys.map { case (t, k) =>
      s"""SELECT '$t' AS table_name, '$k' AS column_name,
         |  CAST(sum(c) AS BIGINT) AS n_rows,
         |  count(*) AS n_keys,
         |  CAST(max(c) AS BIGINT) AS max_rows_per_key,
         |  CAST(min(CASE WHEN c = mc THEN kk END) AS BIGINT) AS hot_key,
         |  CAST((max(c) * count(*) + sum(c) - 1) // sum(c) AS BIGINT)
         |    AS salt_factor
         |FROM (
         |  SELECT kk, c, max(c) OVER () AS mc FROM (
         |    SELECT CAST($k AS BIGINT) AS kk, count(*) AS c
         |    FROM $t GROUP BY 1))""".stripMargin
    }.mkString("\nUNION ALL\n")
}
