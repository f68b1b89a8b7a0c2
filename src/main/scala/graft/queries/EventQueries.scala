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

  /** q158: session-gap tuning curve — total sessions and mean session
    * length (events per session) at gap ∈ {600, 1800, 3600} s, all from
    * ONE lag-window scan: a session count at gap g is just the number of
    * inter-event gaps exceeding g (plus one start per user), so every
    * curve point is a conditional sum over the same gap frame — never a
    * re-sessionization per point. The "choose the gap" input for q34's
    * sessionizer (the tuning-curve pattern applied to the events domain:
    * where the session count stops falling, a longer gap only merges
    * genuinely distinct visits). The g=1800 point is q34's exact session
    * count by construction — cross-query consistency pinned in the spec.
    *
    * Scale shape: one shuffle on user_id feeds the lag window; the three
    * counts ride ONE partial-aggregated single-row aggregate; the
    * 3-row output is an explode over that row. Integer end to end. */
  def q158SessionGapCurve(spark: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsus"), col("event_id"))
    val gaps = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsus"))
      .withColumn("prev", lag(col("tsus"), 1).over(byUser))
    val gapSet = Seq(600L, 1800L, 3600L)
    val aggs = gapSet.map(g => sum(when(col("prev").isNull ||
        col("tsus") - col("prev") > g * 1000000L, 1L).otherwise(0L)).as(s"s$g")) :+
      count(lit(1)).as("n")
    gaps.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(gapSet.map(g => struct(lit(g).as("gap_s"),
        col(s"s$g").as("n_sessions"), col("n").as("n_events"))): _*)).as("x"))
      .select(col("x.gap_s"), col("x.n_sessions"), col("x.n_events"),
        expr("x.n_events * 10000L div x.n_sessions").as("mean_len_e4"))
      .orderBy(col("gap_s"))
  }

  /** q48: as-of (point-in-time) join — every non-purchase event picks up
    * the same user's latest purchase at or before its timestamp (id, exact
    * epoch-μs, value). One shuffle on user_id via the union-tag window
    * (operators.AsOf), never a range join. */
  def q48AsofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val others = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    graft.operators.AsOf.asofJoin(others, purchases, Seq("user_id"),
      "ts", "ts", "event_id", Seq("event_id", "ts", "value"), prefix = "p_")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("p_event_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        graft.functions.TextFunctions.fixedPoint(col("p_value"), 4).as("p_value_e4"))
      .orderBy(col("event_id"))
  }

  /** q50: interval join — activity inside each error's 10-minute blast
    * window, per user, via bucket decomposition (operators.IntervalJoin):
    * equi-join on (user, bucket) + range post-filter, never a
    * BroadcastNestedLoopJoin range join. */
  def q50IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val winUs = 600000000L // 10 min
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("user_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + winUs).as("e_us"))
    val points = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("t_us"))
    val pairs = graft.operators.IntervalJoin.intervalJoin(
      windows, points, Seq("user_id"), "s_us", "e_us", "t_us",
      bucketUs = winUs)
    windows.join(
      pairs.groupBy(col("win_id")).agg(count(lit(1)).as("__n")),
      Seq("win_id"), "left")
      .select(col("win_id"), col("user_id"),
        coalesce(col("__n"), lit(0L)).as("n_in_window"))
      .orderBy(col("win_id"))
  }

  /** q51: anomaly detection — hourly event-count z-scores per event type,
    * flagged at |z| ≥ 2. Mean/variance derive from exact integer sums
    * (Σx, Σx², n), so the doubles are engine-identical. */
  def q51HourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    // tiny after aggregation — materialize once so the stats pass and the
    // z-score join don't each rescan the events table
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      .withColumn("mean", col("s").cast("double") / col("cnt"))
      .withColumn("sd", sqrt((col("ss").cast("double") - col("s").cast("double") * col("s") / col("cnt")) / col("cnt")))
    // sd = 0 (a type with all-equal hourly counts) would make z NaN —
    // Spark silently drops NaN on the filter but DuckDB errors casting
    // NaN to BIGINT, so both sides exclude zero-variance types explicitly
    hourly.join(broadcast(stats.select(col("event_type"), col("mean"), col("sd"))),
      Seq("event_type"))
      .filter(col("sd") > 0)
      .withColumn("z_e4", graft.functions.TextFunctions.fixedPoint(
        (col("n").cast("double") - col("mean")) / col("sd"), 4))
      .filter(abs(col("z_e4")) >= 20000L)
      .select(col("event_type"), col("hour_start"), col("n"), col("z_e4"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** q87: session conversion by session length — do longer sessions
    * convert more? Reuses q34's gap-sessionization window (same single
    * user_id shuffle feeding both window passes), flags purchase sessions,
    * buckets by event count, and reports the conversion rate per bucket
    * as exact e4. */
  def q87SessionConversion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = Tables(spark, dir, "events")
      .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - col("__prev") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("has_purchase"))
    sessions
      .withColumn("len_bucket",
        when(col("n_events") <= 2, "1-2")
          .when(col("n_events") <= 5, "3-5")
          .otherwise("6+"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("has_purchase")).as("n_purchase_sessions"))
      .withColumn("conv_e4", graft.functions.TextFunctions.fixedPoint(
        col("n_purchase_sessions") / col("n_sessions"), 4))
      .orderBy(col("len_bucket"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_session_conversion" -> (q87SessionConversion _),
    "q25_json_extract" -> (q25JsonExtract _),
    "q26_tz_hourly" -> (q26TzHourly _),
    "q27_window_hourly" -> (q27WindowHourly _),
    "q28_comment_words" -> (q28CommentWords _),
    "q34_sessionize" -> (q34Sessionize _),
    "q158_session_gap_curve" -> (q158SessionGapCurve _),
    "q48_asof_purchase" -> (q48AsofPurchase _),
    "q50_interval_join" -> (q50IntervalJoin _),
    "q51_hourly_anomalies" -> (q51HourlyAnomalies _))

  val oracles: Map[String, String] = Map(
    "q87_session_conversion" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS tsus,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (SELECT *, CASE WHEN prev IS NULL OR tsus - prev > 1800000000 THEN 1 ELSE 0 END AS news FROM e),
         s AS (SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id FROM f),
         sess AS (SELECT user_id, session_id, count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
           FROM s GROUP BY 1, 2),
         b AS (SELECT CASE WHEN n_events <= 2 THEN '1-2'
             WHEN n_events <= 5 THEN '3-5' ELSE '6+' END AS len_bucket,
             has_purchase FROM sess)
         SELECT len_bucket, count(*) AS n_sessions,
           CAST(sum(has_purchase) AS BIGINT) AS n_purchase_sessions,
           CAST(floor(CAST(sum(has_purchase) AS DOUBLE)/count(*)*10000 + 0.5) AS BIGINT) AS conv_e4
         FROM b GROUP BY 1 ORDER BY 1""",
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
    // q158: one lag frame, three conditional sums, UNION ALL row per gap.
    "q158_session_gap_curve" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsus,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         a AS (SELECT
             CAST(sum(CASE WHEN prev IS NULL OR tsus - prev > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS s600,
             CAST(sum(CASE WHEN prev IS NULL OR tsus - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS s1800,
             CAST(sum(CASE WHEN prev IS NULL OR tsus - prev > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS s3600,
             CAST(count(*) AS BIGINT) AS n FROM e),
         g AS (SELECT CAST(600 AS BIGINT) AS gap_s, s600 AS n_sessions, n AS n_events FROM a
           UNION ALL SELECT 1800, s1800, n FROM a
           UNION ALL SELECT 3600, s3600, n FROM a)
         SELECT gap_s, n_sessions, n_events,
           CAST(n_events * 10000 // n_sessions AS BIGINT) AS mean_len_e4
         FROM g ORDER BY gap_s""",
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
         WHERE n >= 2 ORDER BY word""",
    "q48_asof_purchase" ->
      """WITH l AS (SELECT event_id, user_id, ts, event_type FROM events
           WHERE event_type <> 'purchase'),
         r AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'purchase'),
         u AS (
           SELECT user_id, ts AS t, 1 AS side, NULL::BIGINT AS tb,
             NULL::BIGINT AS r_eid, NULL::TIMESTAMP AS r_ts, NULL::DOUBLE AS r_val,
             event_id, event_type FROM l
           UNION ALL
           SELECT user_id, ts, 0, event_id, event_id, ts, value,
             NULL::BIGINT, NULL::VARCHAR FROM r),
         m AS (SELECT *,
             last_value(r_eid IGNORE NULLS) OVER win AS p_event_id,
             last_value(r_ts IGNORE NULLS) OVER win AS p_ts,
             last_value(r_val IGNORE NULLS) OVER win AS p_val
           FROM u WINDOW win AS (PARTITION BY user_id ORDER BY t, side, tb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, event_type, p_event_id,
           epoch_us(p_ts) AS p_ts_us,
           CAST(floor(p_val*10000 + 0.5) AS BIGINT) AS p_value_e4
         FROM m WHERE side = 1 ORDER BY event_id""",
    "q50_interval_join" ->
      """WITH w AS (SELECT event_id AS win_id, user_id, epoch_us(ts) AS s_us,
           epoch_us(ts) + 600000000 AS e_us
           FROM events WHERE event_type = 'error'),
         p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS t_us
           FROM events WHERE event_type <> 'error')
         SELECT w.win_id, w.user_id, CAST(count(p.p_id) AS BIGINT) AS n_in_window
         FROM w LEFT JOIN p ON p.user_id = w.user_id
           AND p.t_us >= w.s_us AND p.t_us < w.e_us
         GROUP BY 1, 2 ORDER BY 1""",
    "q51_hourly_anomalies" ->
      """WITH h AS (SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           count(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, count(*) AS cnt, sum(n) AS s, sum(n*n) AS ss
           FROM h GROUP BY 1),
         z AS (SELECT h.event_type, hour_start, n,
             CAST(floor((CAST(n AS DOUBLE) - CAST(s AS DOUBLE)/cnt) /
               sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/cnt)/cnt)
               * 10000 + 0.5) AS BIGINT) AS z_e4
           FROM h JOIN st USING (event_type)
           WHERE (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/cnt)/cnt > 0)
         SELECT event_type, hour_start, n, z_e4 FROM z
         WHERE abs(z_e4) >= 20000 ORDER BY 1, 2""")
}
