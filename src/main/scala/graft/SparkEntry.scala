package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Clean, Quality}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver's testdata star schema, each with an equivalent ANSI SQL oracle the
  * driver runs in DuckDB over the same parquet files. Numeric conventions for
  * engine-independent results:
  *   - double measures are summed through DECIMAL and returned as double
  *     (bit-exact regardless of partitioning / engine);
  *   - `events.ts` (nanos in parquet) is truncated to microseconds on load,
  *     matching DuckDB's reader; oracles `CAST(ts AS TIMESTAMP)` likewise;
  *   - every query ends in a total sort or is an aggregation.
  */
object SparkEntry {

  private case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  private val registry: Map[String, Q] = Map(

    // ----- A-series aggregations / TPC-H-ish core ---------------------------

    // Pricing summary: grouped exact sums + averages over the fact table
    // (the warehouse-side rollup the reference delegates to BigQuery).
    "q01_pricing_summary" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            Analytics.exactSum(col("l_quantity")).as("sum_qty"),
            Analytics.exactSum(col("l_extendedprice")).as("sum_base"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(24,6)")).cast("double").as("sum_disc_price"),
            (sum(col("l_extendedprice").cast("decimal(24,2)")).cast("double") /
              count(lit(1))).as("avg_price"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS sum_base,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Q1/F4/O3 — the dashboard day-slice query (projection + ts range + sort;
    // /root/reference/visualization/app.py:40-51) on the orders fact.
    "q02_day_slice" -> Q(
      (s, dir) => Analytics.daySlice(t(s, dir, "orders"), "o_orderdate",
        "1996-03-01 00:00:00", "1996-03-31 23:59:59",
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"), "o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND o_orderdate <= TIMESTAMP '1996-03-31 23:59:59'
        ORDER BY o_orderdate, o_orderkey""")),

    // Star-schema rollup through two broadcast dimension hops.
    "q03_region_revenue" -> Q(
      (s, dir) => Analytics.revenueByRegion(t(s, dir, "orders"),
        t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region")),
      Some("""SELECT r_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // Top-k by exact-summed measure (aggregate-then-limit, no global sort).
    "q04_top_customers" -> Q(
      (s, dir) => Analytics.topKByMeasure(t(s, dir, "orders"), "o_custkey",
        "o_totalprice", 10),
      Some("""SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(24,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
        FROM orders GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey LIMIT 10""")),

    // C3/W5 — hourly tumbling aggregate over the event stream table.
    "q05_hourly_agg" -> Q(
      (s, dir) => Analytics.hourlyAgg(t(s, dir, "events"), "ts", "value"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1 ORDER BY hour""")),

    // ----- D-series dedup (the reference's signature ops) --------------------

    // D2 — keep-LAST per (key, hour): latest original timestamp wins
    // (transformations.py:233-237 + the hour-floor spec, SURVEY.md §5).
    "q06_dedup_keep_last_hour" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("hour", Clean.floorToHour(col("ts")))
        Clean.dedupKeepLast(ev, Seq("user_id", "hour"), Seq(col("ts"), col("event_id")))
          .select("user_id", "hour", "event_id", "value")
          .orderBy("user_id", "hour")
      },
      Some("""SELECT user_id, hour, event_id, value FROM (
          SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 event_id, value,
                 row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id, hour""")),

    // D1 — keep-FIRST per key, deterministic (transformations.py:76-84).
    "q07_dedup_keep_first" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        Clean.dedupKeepFirst(ev, Seq("user_id", "event_type"),
          Seq(col("ts"), col("event_id")))
          .select("user_id", "event_type", "event_id", "value")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, value FROM (
          SELECT user_id, event_type, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // A5 — duplicate-count audit (README.md:162-168).
    "q08_dup_audit" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        Quality.duplicateAudit(ev,
          Seq(col("user_id"), col("event_type"), to_date(col("ts")).as("day")))
          .orderBy(col("n").desc, col("user_id"), col("event_type"), col("day"))
      },
      Some("""SELECT user_id, event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type, day
        HAVING COUNT(*) > 1
        ORDER BY n DESC, user_id, event_type, day""")),

    // ----- Quality ops --------------------------------------------------------

    // A1 — missingness summary (transformations.py:87-93).
    "q09_missingness" -> Q(
      (s, dir) => Quality.missingness(t(s, dir, "events"),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
      Some(Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        .map(c => s"SELECT '$c' AS column_name, COUNT(*) - COUNT($c) AS missing_count FROM events")
        .mkString("", " UNION ALL ", " ORDER BY column_name"))),

    // A2 — z-score outliers, population std-dev (transformations.py:96-104).
    "q10_outliers_zscore" -> Q(
      (s, dir) => Quality.zscoreOutliers(t(s, dir, "orders"),
        Seq("o_totalprice"), 1.5)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""WITH s AS (SELECT AVG(o_totalprice) AS mu, STDDEV_POP(o_totalprice) AS sd
          FROM orders)
        SELECT o_orderkey, o_totalprice FROM orders, s
        WHERE ABS((o_totalprice - mu) / sd) > 1.5
        ORDER BY o_orderkey""")),

    // F2 — whitelist semi-join (transformations.py:112).
    "q11_whitelist_filter" -> Q(
      (s, dir) => Clean.whitelist(t(s, dir, "customer"), "c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING")).orderBy("c_custkey"),
      Some("""SELECT * FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        ORDER BY c_custkey""")),

    // A6/F5 — trailing-window count anchored at the table max timestamp.
    "q12_trailing_count" -> Q(
      (s, dir) => Quality.trailingCount(t(s, dir, "orders"), "o_orderdate", 365),
      Some("""SELECT COUNT(*) AS n FROM orders
        WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 365 DAY""")),

    // A7 — distinct counts (visualization/app.py:86).
    "q13_distinct_counts" -> Q(
      (s, dir) => t(s, dir, "events").agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types")),
      Some("""SELECT COUNT(DISTINCT user_id) AS n_users,
        COUNT(DISTINCT event_type) AS n_types FROM events""")),

    // ----- C/F/S-series coercion & ingestion shapes ---------------------------

    // C1/S3 — payload field extraction + null-on-failure coercion
    // (fmi_client.py:51-94, pandas errors="coerce" ≈ try_cast).
    "q14_json_coerce" -> Q(
      (s, dir) => t(s, dir, "events").select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": *([0-9]+)", 1)
          .try_cast("bigint").as("k"),
        regexp_extract(col("props"), "\"missing\": *([0-9]+)", 1)
          .try_cast("bigint").as("absent_field"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k,
        TRY_CAST(regexp_extract(props, '"missing": *([0-9]+)', 1) AS BIGINT) AS absent_field
        FROM events ORDER BY event_id""")),

    // F6/D3 batch form — per-key watermark freshness filter: records in the
    // second half of the stream pass only if strictly newer than their key's
    // high-water mark from the first half (kafka_stream.py:269-273).
    "q15_watermark_filter" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cut = ev.agg(expr("max(event_id) div 2").as("__cut"))
        val withCut = ev.crossJoin(broadcast(cut))
        val state = withCut.filter(col("event_id") < col("__cut"))
          .groupBy("user_id").agg(max(col("ts")).as("ts"))
        Analytics.watermarkFilter(
          withCut.filter(col("event_id") >= col("__cut")), state, "user_id", "ts")
          .select("event_id", "user_id")
          .orderBy("event_id")
      },
      Some("""WITH m AS (SELECT MAX(event_id) // 2 AS cut FROM events),
        w AS (SELECT user_id, MAX(CAST(ts AS TIMESTAMP)) AS wm
              FROM events, m WHERE event_id < cut GROUP BY user_id)
        SELECT e.event_id, e.user_id FROM events e CROSS JOIN m
        LEFT JOIN w ON e.user_id = w.user_id
        WHERE e.event_id >= m.cut AND (w.wm IS NULL OR CAST(e.ts AS TIMESTAMP) > w.wm)
        ORDER BY e.event_id""")),

    // F3 — row-validity split (transformations.py:144-178): salvage
    // semantics, rows classified instead of aborting the load.
    "q16_validity_split" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val valid = regexp_extract(col("props"), "\"k\": *([0-9]+)", 1)
          .try_cast("bigint").isNotNull &&
          col("event_type").isin("click", "view", "purchase", "signup", "error") &&
          col("value").isNotNull && col("value") >= 0
        ev.groupBy(when(valid, "valid").otherwise("invalid").as("validity"))
          .agg(count(lit(1)).as("n"))
          .orderBy("validity")
      },
      Some("""SELECT CASE WHEN
          TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) IS NOT NULL
          AND event_type IN ('click', 'view', 'purchase', 'signup', 'error')
          AND value IS NOT NULL AND value >= 0
        THEN 'valid' ELSE 'invalid' END AS validity, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY validity""")),

    // A3 — per-key partition summary (the queryable face of the per-station
    // partitioned tables; materialization = Analytics.writePartitioned).
    "q17_partition_summary" -> Q(
      (s, dir) => Analytics.partitionSummary(t(s, dir, "events"), "user_id", "ts"),
      Some("""SELECT user_id, COUNT(*) AS n,
        MIN(CAST(ts AS TIMESTAMP)) AS min_ts, MAX(CAST(ts AS TIMESTAMP)) AS max_ts
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Window-function surface: per-key running total (DECIMAL accumulator →
    // engine-independent result).
    "q18_running_total" -> Q(
      (s, dir) => Analytics.runningTotal(t(s, dir, "events"), "user_id", "ts",
        "value", "event_id").orderBy("event_id"),
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(24,2))) OVER (
          PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        FROM events ORDER BY event_id"""))
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q03_region_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
