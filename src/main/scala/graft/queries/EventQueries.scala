package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.wsTokens

/** Event-log / semi-structured queries: JSON extraction (SURVEY F/S5),
  * timezone shift (F13), tumbling-window aggregation (the batch twin of the
  * streaming path in graft.streaming), and token explode (F5/F6 UNNEST). */
object EventQueries {

  /** q25: JSON property extraction + grouped rollup — get_json_object over
    * the `props` column, bucketed modulo 10. Monetary doubles as cents. */
  def q25JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"),
        col("value"))
      .groupBy(col("k_mod"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.fixedPoint(col("value"), 2)).as("value_cents"))
      .orderBy(col("k_mod"))

  /** q26: UTC→Asia/Bangkok display shift (reference send_email.py:778-779):
    * events per local hour-of-day with distinct users. */
  def q26TzHourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_format(from_utc_timestamp(col("ts"), "Asia/Bangkok"), "HH").as("hour_ict"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_ict"))

  /** q27: 1-hour tumbling window aggregation — identical semantics to the
    * Structured Streaming ingest (graft.streaming.EventStream); epoch-aligned
    * window start == date_trunc('hour'). */
  def q27WindowHourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.fixedPoint(col("value"), 2)).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy(col("hour_start"), col("event_type"))

  /** q28: UNNEST/explode — whitespace tokens of part names, counted.
    * The arrays_zip/explode surface of SURVEY F5/F6. */
  def q28CommentWords(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(explode(wsTokens(lower(col("p_name")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .orderBy(col("word"))

  /** q34: gap-based sessionization (30-min) — lag → flag → running sum →
    * per-session rollup (graft.streaming.Sessionize.batch; the streaming
    * twin uses flatMapGroupsWithState and is pinned equal in tests). */
  def q34Sessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Sessionize.batch(Tables(spark, dir, "events"))
      .orderBy(col("user_id"), col("session_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_json_extract" -> (q25JsonExtract _),
    "q26_tz_hourly" -> (q26TzHourly _),
    "q27_window_hourly" -> (q27WindowHourly _),
    "q28_comment_words" -> (q28CommentWords _),
    "q34_sessionize" -> (q34Sessionize _))

  val oracles: Map[String, String] = Map(
    "q25_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
         count(*) AS n,
         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1 ORDER BY 1""",
    "q26_tz_hourly" ->
      """SELECT strftime(ts + INTERVAL 7 HOUR, '%H') AS hour_ict,
         count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",
    "q27_window_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q34_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS tsus,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (SELECT *, CASE WHEN prev IS NULL OR tsus - prev > 1800000000 THEN 1 ELSE 0 END AS news FROM e),
         s AS (SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "q28_comment_words" ->
      raw"""SELECT word, n FROM (
           SELECT word, count(*) AS n FROM (
             SELECT unnest(CASE WHEN len(trim(lower(p_name))) = 0 THEN []
               ELSE regexp_split_to_array(trim(lower(p_name)), '\s+') END) AS word
             FROM part)
           GROUP BY 1)
         WHERE n >= 2 ORDER BY word""")
}
