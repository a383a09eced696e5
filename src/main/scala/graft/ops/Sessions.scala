package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch sessionization and vocabulary building — the batch
  * counterparts of the streaming Sessionize operator and the
  * tokenizer-training first step.
  */
object Sessions {

  /** Sessionize events per user with a 30-minute gap rule, via window
    * composition: lag() marks session starts, a cumulative sum numbers
    * sessions, then one aggregation per (user, session). Two window
    * passes over the same (user, ts) partitioning — Catalyst reuses the
    * single sort+shuffle, so the whole operator costs one exchange. */
  def sessionizeBatch(ev: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val marked = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.sumFixed(col("value"), 2).as("session_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  def q31SessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatch(Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"), col("session_no"), col("n_events"),
        col("session_value"), to_date(col("session_start")).as("session_date"))

  val q31Oracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
       |  FROM marked)
       |SELECT user_id, session_no,
       |  count(*) AS n_events,
       |  ${Exact.sumFixedSql("value", 2)} AS session_value,
       |  CAST(min(ts) AS DATE) AS session_date
       |FROM numbered GROUP BY user_id, session_no""".stripMargin

  /** Vocabulary building: token → document frequency + total count,
    * top 100 by count (deterministic tiebreak). The first step of any
    * tokenizer training run: explode + two-level aggregation, partial
    * combines carry (token, counts) so the shuffle is vocabulary-sized,
    * not corpus-sized. */
  def q32Vocabulary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    tok.groupBy(col("token"))
      .agg(
        count(lit(1)).as("total_count"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("total_count").desc, col("token").asc)
      .limit(100)
  }

  val q32Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS total_count, count(DISTINCT doc_id) AS doc_freq
      |FROM tok GROUP BY token
      |ORDER BY total_count DESC, token ASC LIMIT 100""".stripMargin
}
