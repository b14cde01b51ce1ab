package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.pipeline.Medallion
import graft.operators.Analytics
import graft.lake.Upsert

/** Driver contract — every implemented operator from SURVEY.md §2 appears in
  * `queries`, with a DuckDB-equivalent in `oracleSql` where SQL-expressible.
  *
  * Cross-engine determinism rules (see SURVEY §7 risks):
  *  - timestamps compared as epoch-µs longs or dates (DuckDB truncates the
  *    parquet ns column to µs on read; we floor-divide the nanos long);
  *  - money sums go through DECIMAL(18,2) then cast to double → bit-stable
  *    under any partitioning, identical in both engines;
  *  - every top-k has a unique tiebreaker column.
  */
object SparkEntry {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    Medallion.salesMinute(Tables.events(spark, "/root/testdata/sf0.001"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- medallion pipeline (SURVEY §2.11 Q1–Q12) ----
    "q01_bronze_project" -> ((s, d) => Medallion.bronzeProject(Tables.events(s, d))),
    "q02_dedup_latest" -> ((s, d) =>
      Medallion.dedupLatest(Tables.events(s, d))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))),
    "q03_parse_props" -> ((s, d) => Medallion.parseProps(Tables.events(s, d))),
    "q04_user_spend" -> ((s, d) =>
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(Medallion.moneySum(col("value")).as("paid_amount"),
             max(col("event_ts_us")).as("last_purchase_us"),
             count(lit(1)).as("n_purchases"))),
    "q05_enrich" -> ((s, d) =>
      Medallion.enrich(Tables.orders(s, d), Tables.lineitem(s, d))
        .select(col("order_id"), col("user_id"), col("total_amount"),
                col("paid_amount"), col("fully_paid"))),
    "q06_enrich_view" -> ((s, d) =>
      Medallion.enrichView(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q07_fct_sales_minute" -> ((s, d) => Medallion.salesMinute(Tables.events(s, d))),
    "q08_sales_minute_incr" -> ((s, d) =>
      Medallion.salesMinuteIncremental(Tables.events(s, d), 7200000000L)),
    "q09_sales_last_60min" -> ((s, d) =>
      Medallion.salesLastNMinutes(Tables.events(s, d), 60)),
    "q10_upsert_idempotent" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_ts_us"), col("value"))
      val target = ev.filter(col("event_id") % 3 === 0)
      val source = ev.filter(col("event_id") % 2 === 0)
      val once = Upsert.merge(target, source, Seq("event_id"), Seq("event_ts_us", "event_id"))
      Upsert.merge(once, source, Seq("event_id"), Seq("event_ts_us", "event_id"))
    }),
    "q11_freshness" -> ((s, d) => Medallion.freshness(Tables.events(s, d))),
    "q12_top_minutes" -> ((s, d) => Medallion.topMinutes(Tables.events(s, d), 10)),
    // ---- relational analytics (SURVEY §2.3–§2.7) ----
    "q13_pricing_summary" -> ((s, d) => Analytics.pricingSummary(Tables.lineitem(s, d))),
    "q14_revenue_by_region" -> ((s, d) =>
      Analytics.revenueByRegion(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q15_top_customers" -> ((s, d) =>
      Analytics.topCustomers(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), 10)),
    "q16_running_spend" -> ((s, d) => Analytics.runningSpend(Tables.events(s, d))),
    "q17_part_rank" -> ((s, d) => Analytics.partPriceRank(Tables.part(s, d))),
    "q18_status_diff" -> ((s, d) => Analytics.statusCustkeyDiff(Tables.orders(s, d))),
    "q19_event_pivot" -> ((s, d) => Analytics.eventPivot(Tables.events(s, d), eventTypes)),
    "q20_lineitem_unpivot" -> ((s, d) => Analytics.lineitemUnpivot(Tables.lineitem(s, d))),
    "q21_minute_spine" -> ((s, d) => Analytics.minuteSpine(Tables.events(s, d))),
    "q22_hash_keys" -> ((s, d) => Analytics.hashKeys(Tables.events(s, d))),
    "q23_acctbal_histogram" -> ((s, d) => Analytics.acctbalHistogram(Tables.customer(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_bronze_project" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS raw_key, props AS raw_value,
         event_type AS topic, epoch_us(ts) AS event_ts_us, CAST(ts AS DATE) AS event_date
         FROM events""",
    "q02_dedup_latest" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1""",
    "q03_parse_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events""",
    "q04_user_spend" ->
      """SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS paid_amount,
         MAX(epoch_us(ts)) AS last_purchase_us, COUNT(*) AS n_purchases
         FROM events WHERE event_type = 'purchase' GROUP BY user_id""",
    "q05_enrich" ->
      """SELECT o.o_orderkey AS order_id, o.o_custkey AS user_id,
         o.o_totalprice AS total_amount,
         CAST(COALESCE(p.paid_amount, 0.0) AS DOUBLE) AS paid_amount,
         COALESCE(p.paid_amount, 0.0) >= o.o_totalprice AS fully_paid
         FROM orders o LEFT JOIN (
           SELECT l_orderkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS paid_amount
           FROM lineitem GROUP BY l_orderkey) p ON p.l_orderkey = o.o_orderkey""",
    "q06_enrich_view" ->
      """SELECT o.o_orderkey AS order_id, o.o_orderstatus AS order_status,
         o.o_totalprice AS total_amount,
         CAST(COALESCE(p.paid_amount, 0.0) AS DOUBLE) AS paid_amount,
         COALESCE(p.paid_amount, 0.0) >= o.o_totalprice AS fully_paid,
         CAST(o.o_orderdate AS DATE) AS event_date
         FROM orders o LEFT JOIN (
           SELECT l_orderkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS paid_amount
           FROM lineitem GROUP BY l_orderkey) p ON p.l_orderkey = o.o_orderkey""",
    "q07_fct_sales_minute" ->
      """SELECT epoch_us(date_trunc('minute', ts)) AS minute_bucket_us,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
         COUNT(*) AS paid_orders
         FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1""",
    "q08_sales_minute_incr" ->
      """SELECT epoch_us(date_trunc('minute', ts)) AS minute_bucket_us,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
         COUNT(*) AS paid_orders
         FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
           AND epoch_us(ts) >= (SELECT MAX(epoch_us(ts)) - 7200000000 FROM events)
         GROUP BY 1""",
    "q09_sales_last_60min" ->
      """WITH fct AS (
           SELECT epoch_us(date_trunc('minute', ts)) AS minute_bucket_us,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
             COUNT(*) AS paid_orders
           FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1)
         SELECT * FROM fct
         WHERE minute_bucket_us >= (SELECT MAX(minute_bucket_us) - 3600000000 FROM fct)""",
    "q10_upsert_idempotent" ->
      """SELECT event_id, epoch_us(ts) AS event_ts_us, value FROM events
         WHERE event_id % 3 = 0 OR event_id % 2 = 0""",
    "q11_freshness" ->
      """SELECT event_type, MAX(epoch_us(ts)) AS max_ts_us, COUNT(*) AS n
         FROM events GROUP BY event_type""",
    "q12_top_minutes" ->
      """SELECT epoch_us(date_trunc('minute', ts)) AS minute_bucket_us,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
         COUNT(*) AS paid_orders
         FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1
         ORDER BY gmv DESC, minute_bucket_us LIMIT 10""",
    "q13_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q14_revenue_by_region" ->
      """SELECT r.r_name AS region,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM region r
         JOIN nation n ON n.n_regionkey = r.r_regionkey
         JOIN customer c ON c.c_nationkey = n.n_nationkey
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY r.r_name""",
    "q15_top_customers" ->
      """SELECT c.c_custkey AS custkey, c.c_name AS name,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY c.c_custkey, c.c_name
         ORDER BY revenue DESC, custkey LIMIT 10""",
    "q16_running_spend" ->
      """SELECT event_id, user_id, epoch_us(ts) AS event_ts_us,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
         FROM events WHERE event_type = 'purchase'""",
    "q17_part_rank" ->
      """SELECT p_partkey, p_brand, p_retailprice, price_rank FROM (
           SELECT p_partkey, p_brand, p_retailprice,
             dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
             row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
           FROM part) WHERE rn <= 3""",
    "q18_status_diff" ->
      """(SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
         UNION ALL
         (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')""",
    "q19_event_pivot" ->
      """SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
         CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
         CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
         FROM events GROUP BY user_id""",
    "q20_lineitem_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'extendedprice' AS metric, l_extendedprice AS val FROM lineitem""",
    "q21_minute_spine" ->
      """WITH fct AS (
           SELECT epoch_us(date_trunc('minute', ts)) AS minute_bucket_us,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
             COUNT(*) AS paid_orders
           FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1),
         spine AS (
           SELECT unnest(generate_series(
             (SELECT MIN(minute_bucket_us) FROM fct),
             (SELECT MAX(minute_bucket_us) FROM fct),
             60000000)) AS minute_bucket_us)
         SELECT s.minute_bucket_us, COALESCE(f.gmv, 0.0) AS gmv,
           COALESCE(f.paid_orders, 0) AS paid_orders
         FROM spine s LEFT JOIN fct f ON f.minute_bucket_us = s.minute_bucket_us""",
    "q22_hash_keys" ->
      """SELECT event_id,
         sha256(concat_ws(':', event_type, CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR))) AS event_key,
         md5(concat_ws('-', CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR))) AS surrogate
         FROM events""",
    "q23_acctbal_histogram" ->
      """SELECT LEAST(GREATEST(CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) + 1, 1), 20) AS bucket,
         COUNT(*) AS n FROM customer GROUP BY 1""",
  )
}
