package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{fixedPoint, tokenCount}

/** OLAP-analytics breadth: multi-granularity rollup, pivot, windowed
  * moving average, and an ordered conversion funnel — the reporting
  * surface a warehouse user expects next to the relational core. All
  * integer-derived; every query has a bit-exact DuckDB oracle. */
object AnalyticsQueries {

  /** q68: ROLLUP over (lang, source) — doc and token totals at every
    * granularity in ONE pass (Spark expands grouping sets inside the
    * aggregate; no per-level rescan). gid disambiguates levels exactly as
    * the engines compute it: grouping(lang)·2 + grouping(source). */
  def q68Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .rollup(col("lang"), col("source"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang_g"),
        coalesce(col("source"), lit("ALL")).as("source_g"),
        col("gid").cast("long").as("gid"), col("n_docs"), col("n_tokens"))
      .orderBy(col("gid"), col("lang_g"), col("source_g"))

  private val PivotSources = (0 to 4).map(i => s"src$i")

  /** q69: pivot — docs per (lang × source) as columns, over an EXPLICIT
    * value list (an inferred list would need a separate distinct pass and
    * make the schema data-dependent; at 100 TB you pin the columns). */
  def q69Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .pivot("source", PivotSources)
      .agg(count(lit(1)))
      .select(col("lang") +: PivotSources.map(s =>
        coalesce(col(s), lit(0L)).as(s)): _*)
      .orderBy(col("lang"))

  /** q70: trailing 3-hour moving average of hourly event counts per type —
    * the smoothing window every ops dashboard runs. Window partitioned by
    * event type (parallel across types); avg derives from two integer
    * window sums, so the e4 value is engine-exact. */
  def q70MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-2, 0)
    hourly
      .withColumn("ma3_e4",
        fixedPoint(sum(col("n")).over(w) / count(lit(1)).over(w), 4))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** q71: ordered conversion funnel — users whose first view precedes a
    * click that precedes a purchase (strict event-time order, first
    * qualifying event per stage). Three co-partitioned shuffles on
    * user_id; each stage's frame is one row per surviving user, so the
    * joins stay narrow at any event volume. */
  def q71Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("v_ts"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("tus") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("tus") > col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("p_ts"))
    val all = e.select(col("user_id")).distinct().count()
    Seq(("0_all", all), ("1_view", v.count()),
      ("2_click_after_view", c.count()),
      ("3_purchase_after_click", p.count()))
      .toDF("stage", "n_users")
      .orderBy(col("stage"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_rollup" -> (q68Rollup _),
    "q69_pivot" -> (q69Pivot _),
    "q70_moving_avg" -> (q70MovingAvg _),
    "q71_funnel" -> (q71Funnel _))

  import TextQueries.tokCountSql

  val oracles: Map[String, String] = Map(
    "q68_rollup" ->
      raw"""WITH t AS (SELECT lang, source, CAST($tokCountSql AS BIGINT) AS n_tok
             FROM documents)
         SELECT coalesce(lang, 'ALL') AS lang_g, coalesce(source, 'ALL') AS source_g,
           CAST(grouping_id(lang, source) AS BIGINT) AS gid,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         FROM t GROUP BY ROLLUP(lang, source)
         ORDER BY gid, lang_g, source_g""",
    "q69_pivot" ->
      ("SELECT lang, " + (0 to 4).map(i =>
        s"CAST(count(*) FILTER (source = 'src$i') AS BIGINT) AS src$i")
        .mkString(", ") +
        " FROM documents GROUP BY lang ORDER BY lang"),
    "q70_moving_avg" ->
      """WITH h AS (SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, hour_start, n,
           CAST(floor(CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w * 10000 + 0.5) AS BIGINT) AS ma3_e4
         FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY event_type, hour_start""",
    "q71_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
         v AS (SELECT user_id, min(tus) AS v_ts FROM e
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(tus) AS c_ts FROM e JOIN v USING (user_id)
           WHERE event_type = 'click' AND tus > v_ts GROUP BY 1),
         p AS (SELECT e.user_id, min(tus) AS p_ts FROM e JOIN c USING (user_id)
           WHERE event_type = 'purchase' AND tus > c_ts GROUP BY 1)
         SELECT * FROM (
           SELECT '0_all' AS stage, count(DISTINCT user_id) AS n_users FROM e
           UNION ALL SELECT '1_view', count(*) FROM v
           UNION ALL SELECT '2_click_after_view', count(*) FROM c
           UNION ALL SELECT '3_purchase_after_click', count(*) FROM p)
         ORDER BY stage""")
}
