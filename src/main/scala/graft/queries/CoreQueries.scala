package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Relational

/** The core relational query surface (SURVEY §2.1–2.8) expressed over the
  * TPC-H-ish fixtures. Each query has a DuckDB oracle (Oracles.scala) with
  * identical column names and deterministic values:
  *   - monetary doubles aggregate as cents-BIGINT (exact, engine-independent)
  *   - every top-k / window has a unique tie-break
  *   - timestamps surface as 'yyyy-MM-dd' strings or date_trunc'd values
  */
object CoreQueries {

  /** Money as exact cents — sums of doubles are order-dependent, sums of
    * longs are not; both Spark and DuckDB agree bit-for-bit on BIGINT.
    * floor(x*100 + 0.5), NOT round(): decimal round() implementations
    * disagree on representation ties across engines (see
    * TextFunctions.fixedPoint). */
  private def cents(c: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.fixedPoint(c, 2)

  /** q1: TPC-H Q1-shaped pricing summary — groupBy + sum/count/avg (A1/A5/A6).
    * Whole-stage-codegen'd partial agg (map-side combine) → one shuffle on
    * the 2 grouping keys; scan prunes to 7 columns. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2: 3-way join to tiny dims — revenue per nation (J1). nation/customer
    * are broadcast (dim side ≪ threshold); only lineitem⋈orders shuffles. */
  def q2RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q3: anti-join — customers with no urgent orders (J2: LEFT JOIN .. IS NULL). */
  def q3CustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Relational.antiJoin(c, o, Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q4: semi-join — parts that shipped at least once (J4: IN subquery). */
  def q4PartsShipped(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val li = Tables(spark, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
    Relational.semiJoin(p, li, Seq("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** q5: latest order per customer — ROW_NUMBER dedup (W1), orderkey tie-break. */
  def q5LatestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Relational.latestPerGroup(
      Tables(spark, dir, "orders"), Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
        col("o_orderstatus"))
      .orderBy(col("o_custkey"))

  /** q6: argmax — all orders on each customer's max order date (J7). */
  def q6ArgmaxOrderDate(spark: SparkSession, dir: String): DataFrame =
    Relational.argmax(Tables(spark, dir, "orders"), Seq("o_custkey"), "o_orderdate")
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** q7: count(distinct) + conditional count(distinct) per group — the
    * reporting rollup (A2), single grouped pass instead of the reference's
    * N-queries-per-source loop (send_email.py:430-492). */
  def q7StatusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("n_customers_f"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** q8: top-k — ORDER BY .. LIMIT (O1) → TakeOrderedAndProject (true top-k,
    * no global sort: per-partition heaps + driver merge of k rows). */
  def q8Top10Orders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("o_totalprice_cents"))
      .orderBy(col("o_totalprice_cents").desc, col("o_orderkey"))
      .limit(10)

  /** q9: UNION ALL of two filtered slices + distinct-style rollup (U1). */
  def q9UnionSlices(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val hi = o.filter(col("o_totalprice") >= 100000).withColumn("slice", lit("high"))
    val ur = o.filter(col("o_orderpriority") === "1-URGENT").withColumn("slice", lit("urgent"))
    hi.unionByName(ur)
      .groupBy(col("slice"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy(col("slice"))
  }

  /** q10: calendar-picker — min open date with max-date fallback (O1,
    * etl_manager.py:48-67): one aggregate pass, no try/except re-query. */
  def q10NextEtlDate(spark: SparkSession, dir: String): DataFrame =
    Relational.pickNextOrFallback(
      Tables(spark, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("etl_date"),
                col("o_orderstatus")),
      col("o_orderstatus") === "O", "etl_date")

  /** q11: bool_and/bool_or per group with empty-safe coalesce (A3/A4,
    * Python all([])==True parity — SURVEY §7.4.5). */
  def q11BoolRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        Relational.boolAllExpr(col("o_orderstatus").isin("F", "O")).as("all_closed_or_open"),
        Relational.boolAnyExpr(col("o_orderstatus") === "P").as("any_pending"))
      .orderBy(col("o_orderpriority"))

  /** q12: null-safe split-element routing (P3/F1/F2) — TRY(split(x,'-')[2]). */
  def q12SplitRouting(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(Relational.tryElementAt(col("o_orderpriority"), "-", 2).as("prio_word"))
      .groupBy(col("prio_word")).agg(count(lit(1)).as("n"))
      .orderBy(col("prio_word"))

  /** q13: month-bucket predicate + grouped counts over events (P5/F11). */
  def q13EventsByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("month"), col("event_type"))

  /** q14: SCD2 close-off via lead() — satellite load_end_date semantics
    * (SURVEY §2.5, etl_manager.py:1231). Orders per customer become
    * versioned rows; the open row has null valid_to. */
  def q14Scd2Orders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("valid_from", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("valid_to",
        date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd"))
      .select(col("o_custkey"), col("o_orderkey"), col("valid_from"), col("valid_to"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q15: merge-as-rewrite (J5) — upsert urgent orders' status over the
    * base table, full-outer + coalesce, then aggregate to a stable shape. */
  def q15MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val src = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
    Relational.mergeAsRewrite(o, src, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** q53: supplier-side revenue per nation — the supplier dim's twin of q2
    * (completes fixture-table coverage: every driver table is queried).
    * supplier/nation broadcast; lineitem is the only shuffled side. */
  def q53SupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("n_name"))
  }

  /** q61: revenue by market segment THROUGH the salted join — the skew-
    * robust join path (Relational.saltedJoin: skewed side salted mod 8,
    * build side replicated 8x) on the oracle surface. Results are by
    * definition those of the plain equi-join, which is exactly what the
    * DuckDB oracle runs — the query proves the salting is a pure physical
    * rewrite. */
  def q61SaltedSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    graft.ops.Relational.saltedJoin(o, c, Seq("custkey"), salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** q62: urgent-order revenue THROUGH the Bloom pre-filtered join — the
    * fact side (lineitem) is cut by a 2^19-bit Bloom sketch of the urgent
    * order keys BEFORE the exact join, so at scale the non-matching ~80%
    * of the fact scan never reaches the exchange. Bloom filters have no
    * false negatives and the exact join clears false positives, so the
    * result is by definition the plain join's — which is exactly what the
    * DuckDB oracle runs (same pure-physical-rewrite contract as q61). */
  def q62BloomRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    graft.operators.BloomFilter
      .prefilteredJoin(Tables(spark, dir, "lineitem"), urgent,
        "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** q76: incremental aggregate maintenance — the pre-1996 revenue rollup
    * refreshed with the 1996+ batch via Relational.mergeAggregates. Cost ∝
    * batch, not table; the oracle aggregates ALL rows from scratch, so a
    * hash match proves refresh ≡ recompute. */
  def q76IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
    val li = Tables(spark, dir, "lineitem")
    val base = rollup(li.filter(col("l_shipdate") < lit("1996-01-01")))
    val delta = rollup(li.filter(col("l_shipdate") >= lit("1996-01-01")))
    Relational.mergeAggregates(base, delta, Seq("l_returnflag"),
      sumCols = Seq("n_items", "revenue_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** q77: CDC snapshot diff — a synthetic evolution of orders (delete
    * key%97, bump totalprice on key%13, clone key%101 under new keys) is
    * diffed against the original with Relational.snapshotDiff; per-action
    * row counts and key checksums. The oracle rebuilds the same new
    * snapshot and classifies with the same full-outer compare. */
  def q77SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val key = col("o_orderkey")
    val survivors = o.filter(key % 97 =!= 0)
      .withColumn("o_totalprice",
        when(key % 13 === 0, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val clones = o.filter(key % 101 === 0)
      .withColumn("o_orderkey", key + 10000000L)
    Relational.snapshotDiff(o, survivors.unionByName(clones), Seq("o_orderkey"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("action"))
  }

  /** q101: market share (TPC-H Q8 shape) — per order year, the EUROPE-
    * supplier share of total revenue through the 5-table lineitem→orders→
    * supplier→nation→region path. The fact table joins ONE at-scale side
    * (orders, keyed shuffle); supplier/nation/region all broadcast. Both
    * revenue sums are integer cents in a single aggregate pass
    * (conditional + total — no second scan, no self-join), share is one
    * terminal e4 division. */
  def q101MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("r_name") === "EUROPE", rev).otherwise(lit(0L))).as("eu_cents"),
        sum(rev).as("total_cents"))
      .select(col("o_year"), col("eu_cents"), col("total_cents"),
        graft.functions.TextFunctions.fixedPoint(
          col("eu_cents") / col("total_cents"), 4).as("eu_share_e4"))
      .orderBy(col("o_year"))
  }

  /** q102: the analytic-window suite over each customer's order history —
    * lag/lead, ntile quartiles, percent_rank/cume_dist (e4-quantized;
    * the (o_orderdate, o_orderkey) order is UNIQUE so rank doubles are
    * deterministic), first-order price, and a running spend cumsum with
    * an explicit ROWS frame. One window partition per customer — the
    * at-scale shape (millions of small partitions), never a global sort.
    * Restricted to custkey < 100 and ≥ 2 orders to keep the dump small. */
  def q102WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    val fp = graft.functions.TextFunctions.fixedPoint _
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"), col("o_orderdate"))
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        row_number().over(w).as("order_seq"),
        ntile(4).over(w).as("spend_quartile"),
        fp(percent_rank().over(w), 4).as("pr_e4"),
        fp(cume_dist().over(w), 4).as("cd_e4"),
        first(col("price_cents")).over(w).as("first_cents"),
        sum(col("price_cents"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("run_cents"),
        count(lit(1)).over(wAll).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("prev_orderkey"),
        col("next_orderkey"), col("order_seq").cast("long").as("order_seq"),
        col("spend_quartile").cast("long").as("spend_quartile"),
        col("pr_e4"), col("cd_e4"), col("first_cents"), col("run_cents"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_market_share" -> (q101MarketShare _),
    "q102_window_suite" -> (q102WindowSuite _),
    "q61_salted_segment_revenue" -> (q61SaltedSegmentRevenue _),
    "q62_bloom_revenue" -> (q62BloomRevenue _),
    "q76_incremental_agg" -> (q76IncrementalAgg _),
    "q77_snapshot_diff" -> (q77SnapshotDiff _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_revenue_by_nation" -> (q2RevenueByNation _),
    "q3_customers_no_orders" -> (q3CustomersNoOrders _),
    "q4_parts_shipped" -> (q4PartsShipped _),
    "q5_latest_order_per_customer" -> (q5LatestOrderPerCustomer _),
    "q6_argmax_order_date" -> (q6ArgmaxOrderDate _),
    "q7_status_rollup" -> (q7StatusRollup _),
    "q8_top10_orders" -> (q8Top10Orders _),
    "q9_union_slices" -> (q9UnionSlices _),
    "q10_next_etl_date" -> (q10NextEtlDate _),
    "q11_bool_rollup" -> (q11BoolRollup _),
    "q12_split_routing" -> (q12SplitRouting _),
    "q13_events_by_month" -> (q13EventsByMonth _),
    "q14_scd2_orders" -> (q14Scd2Orders _),
    "q15_merge_upsert" -> (q15MergeUpsert _),
    "q53_supplier_revenue" -> (q53SupplierRevenue _),
  )

  /** DuckDB oracle SQL — same column names, same determinism rules. */
  val oracles: Map[String, String] = Map(
    "q101_market_share" ->
      """WITH t AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           r_name, CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) AS rev
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         a AS (SELECT o_year,
           CAST(sum(CASE WHEN r_name = 'EUROPE' THEN rev ELSE 0 END) AS BIGINT) AS eu_cents,
           CAST(sum(rev) AS BIGINT) AS total_cents
           FROM t GROUP BY 1)
         SELECT o_year, eu_cents, total_cents,
           CAST(floor(eu_cents/total_cents*10000 + 0.5) AS BIGINT) AS eu_share_e4
         FROM a ORDER BY 1""",
    "q102_window_suite" ->
      """WITH t AS (SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents, o_orderdate
           FROM orders WHERE o_custkey < 100),
         win AS (SELECT o_custkey, o_orderkey,
           lag(o_orderkey, 1) OVER w AS prev_orderkey,
           lead(o_orderkey, 1) OVER w AS next_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
           CAST(floor(percent_rank() OVER w * 10000 + 0.5) AS BIGINT) AS pr_e4,
           CAST(floor(cume_dist() OVER w * 10000 + 0.5) AS BIGINT) AS cd_e4,
           first_value(price_cents) OVER w AS first_cents,
           CAST(sum(price_cents) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
           FROM t
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
         SELECT o_custkey, o_orderkey, prev_orderkey, next_orderkey, order_seq,
           spend_quartile, pr_e4, cd_e4, first_cents, run_cents
         FROM win WHERE n_orders >= 2 ORDER BY o_custkey, order_seq""",
    "q76_incremental_agg" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q77_snapshot_diff" ->
      """WITH new AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 97 <> 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 101 = 0),
         d AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                  WHEN n.o_orderkey IS NULL THEN 'deleted'
                  WHEN NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey
                    AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                    AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
                    AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
                  THEN 'updated' END AS action
           FROM orders o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
         SELECT action, count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS key_sum
         FROM d WHERE action IS NOT NULL GROUP BY 1 ORDER BY 1""",
    "q62_bloom_revenue" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY 1""",
    "q61_salted_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q2_revenue_by_nation" ->
      """SELECT n_name,
         CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q3_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q4_parts_shipped" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
    "q5_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderstatus
         FROM (SELECT *, row_number() OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders) WHERE rn = 1
         ORDER BY o_custkey""",
    "q6_argmax_order_date" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
         FROM (SELECT *, max(o_orderdate) OVER (PARTITION BY o_custkey) AS mx
               FROM orders) WHERE o_orderdate = mx
         ORDER BY o_custkey, o_orderkey""",
    "q7_status_rollup" ->
      """SELECT o_orderpriority,
         count(DISTINCT o_custkey) AS n_customers,
         count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_customers_f,
         count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q8_top10_orders" ->
      """SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS o_totalprice_cents
         FROM orders ORDER BY o_totalprice_cents DESC, o_orderkey LIMIT 10""",
    "q9_union_slices" ->
      """SELECT slice, count(*) AS n, count(DISTINCT o_custkey) AS n_cust FROM (
           SELECT o_custkey, 'high' AS slice FROM orders WHERE o_totalprice >= 100000
           UNION ALL
           SELECT o_custkey, 'urgent' AS slice FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY 1 ORDER BY 1""",
    "q10_next_etl_date" ->
      """SELECT coalesce(
           min(CASE WHEN o_orderstatus = 'O' THEN strftime(o_orderdate, '%Y-%m-%d') END),
           max(strftime(o_orderdate, '%Y-%m-%d'))) AS etl_date
         FROM orders""",
    "q11_bool_rollup" ->
      """SELECT o_orderpriority,
         coalesce(bool_and(o_orderstatus IN ('F','O')), true) AS all_closed_or_open,
         coalesce(bool_or(o_orderstatus = 'P'), false) AS any_pending
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q12_split_routing" ->
      """SELECT CASE WHEN len(string_split(o_orderpriority, '-')) >= 2
                THEN string_split(o_orderpriority, '-')[2] END AS prio_word,
         count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q13_events_by_month" ->
      """SELECT strftime(ts, '%Y-%m') AS month, event_type,
         count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q14_scd2_orders" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
         strftime(lead(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS valid_to
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q15_merge_upsert" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
           SELECT CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                       ELSE t.o_orderstatus END AS o_orderstatus
           FROM orders t FULL OUTER JOIN
             (SELECT o_orderkey, 'U' AS o_orderstatus FROM orders
              WHERE o_orderpriority = '1-URGENT') s
           ON t.o_orderkey = s.o_orderkey)
         GROUP BY 1 ORDER BY 1""",
    "q53_supplier_revenue" ->
      """SELECT n_name, count(*) AS n_items,
         CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
         count(DISTINCT s_suppkey) AS n_suppliers
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
  )
}
