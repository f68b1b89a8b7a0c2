package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.vault.Vault

/** Data Vault build queries over the TPC-H-ish fixtures: hub, link, and
  * SCD2 satellite with change compression. Hash keys are md5 over
  * '||'-joined business keys — identical in DuckDB, so the whole vault
  * build is oracle-checked end to end. Load dates are fixture-derived
  * (order dates) to stay deterministic. */
object VaultQueries {

  /** q29: customer hub — one row per business key with md5 hash key. */
  def q29HubCustomer(spark: SparkSession, dir: String): DataFrame =
    Vault.hub(Tables(spark, dir, "customer"), "customer", Seq("c_custkey"),
      lit("2024-01-01"), "tpch")
      .orderBy(col("hub_customer_hash_key"))

  /** q30: order↔customer link — distinct key combinations, parent hub keys. */
  def q30LinkOrderCustomer(spark: SparkSession, dir: String): DataFrame =
    Vault.link(Tables(spark, dir, "orders"), "order_customer",
      Seq("order" -> Seq("o_orderkey"), "customer" -> Seq("o_custkey")),
      lit("2024-01-01"), "tpch")
      .orderBy(col("link_order_customer_hash_key"))

  /** q31: SCD2 satellite of order status/priority per customer — change
    * compression via lag(hash_diff), close-off via lead(load_date). */
  def q31SatelliteOrders(spark: SparkSession, dir: String): DataFrame =
    Vault.satellite(
      Tables(spark, dir, "orders")
        .withColumn("load_date", date_format(col("o_orderdate"), "yyyy-MM-dd")),
      "customer_orders", Seq("o_custkey"),
      Seq("o_orderstatus", "o_orderpriority"), "load_date", Seq("o_orderkey"))
      .orderBy(col("sat_customer_orders_hash_key"), col("load_date"), col("hash_diff"))

  /** q81: point-in-time snapshot — the satellite version current at
    * 1996-06-30 per customer (Vault.snapshotAt over q31's satellite).
    * Row-level time travel as one filter; the SCD2 close-off already paid
    * for it at build time. */
  def q81SnapshotAt(spark: SparkSession, dir: String): DataFrame =
    Vault.snapshotAt(
      Vault.satellite(
        Tables(spark, dir, "orders")
          .withColumn("load_date", date_format(col("o_orderdate"), "yyyy-MM-dd")),
        "customer_orders", Seq("o_custkey"),
        Seq("o_orderstatus", "o_orderpriority"), "load_date", Seq("o_orderkey")),
      lit("1996-06-30"))
      .select(col("sat_customer_orders_hash_key"), col("load_date"),
        col("o_orderstatus"), col("o_orderpriority"))
      .orderBy(col("sat_customer_orders_hash_key"), col("load_date"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_hub_customer" -> (q29HubCustomer _),
    "q30_link_order_customer" -> (q30LinkOrderCustomer _),
    "q31_satellite_orders" -> (q31SatelliteOrders _),
    "q81_snapshot_at" -> (q81SnapshotAt _))

  val oracles: Map[String, String] = Map(
    "q29_hub_customer" ->
      """SELECT md5(CAST(c_custkey AS VARCHAR)) AS hub_customer_hash_key,
         c_custkey, '2024-01-01' AS load_date, 'tpch' AS record_source
         FROM (SELECT DISTINCT c_custkey FROM customer) ORDER BY 1""",
    "q30_link_order_customer" ->
      """SELECT md5(CAST(o_orderkey AS VARCHAR)||'||'||CAST(o_custkey AS VARCHAR)) AS link_order_customer_hash_key,
         md5(CAST(o_orderkey AS VARCHAR)) AS hub_order_hash_key,
         md5(CAST(o_custkey AS VARCHAR)) AS hub_customer_hash_key,
         '2024-01-01' AS load_date, 'tpch' AS record_source
         FROM (SELECT DISTINCT o_orderkey, o_custkey FROM orders) ORDER BY 1""",
    "q81_snapshot_at" ->
      """WITH staged AS (
           SELECT md5(CAST(o_custkey AS VARCHAR)) AS sat_customer_orders_hash_key,
             strftime(o_orderdate, '%Y-%m-%d') AS load_date, o_orderkey,
             md5(o_orderstatus||'||'||o_orderpriority) AS hash_diff,
             o_orderstatus, o_orderpriority
           FROM orders),
         changed AS (
           SELECT * FROM (
             SELECT *, lag(hash_diff) OVER
               (PARTITION BY sat_customer_orders_hash_key
                ORDER BY load_date, o_orderkey) AS prev
             FROM staged)
           WHERE prev IS NULL OR prev <> hash_diff),
         sat AS (
           SELECT sat_customer_orders_hash_key, load_date,
             lead(load_date) OVER
               (PARTITION BY sat_customer_orders_hash_key
                ORDER BY load_date, o_orderkey) AS load_end_date,
             o_orderstatus, o_orderpriority
           FROM changed)
         SELECT sat_customer_orders_hash_key, load_date,
           o_orderstatus, o_orderpriority
         FROM sat
         WHERE load_date <= '1996-06-30'
           AND (load_end_date IS NULL OR load_end_date > '1996-06-30')
         ORDER BY 1, 2""",
    "q31_satellite_orders" ->
      """WITH staged AS (
           SELECT md5(CAST(o_custkey AS VARCHAR)) AS sat_customer_orders_hash_key,
             strftime(o_orderdate, '%Y-%m-%d') AS load_date, o_orderkey,
             md5(o_orderstatus||'||'||o_orderpriority) AS hash_diff,
             o_orderstatus, o_orderpriority
           FROM orders),
         changed AS (
           SELECT * FROM (
             SELECT *, lag(hash_diff) OVER
               (PARTITION BY sat_customer_orders_hash_key
                ORDER BY load_date, o_orderkey) AS prev
             FROM staged)
           WHERE prev IS NULL OR prev <> hash_diff)
         SELECT sat_customer_orders_hash_key, load_date,
           lead(load_date) OVER
             (PARTITION BY sat_customer_orders_hash_key
              ORDER BY load_date, o_orderkey) AS load_end_date,
           hash_diff, o_orderstatus, o_orderpriority
         FROM changed ORDER BY 1, 2, 4""")
}
