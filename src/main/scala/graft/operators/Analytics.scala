package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical queries over the warehouse (SURVEY.md §2.6-2.8) plus the
  * join/window/top-k surface Spark provides for free and the reference
  * delegates to BigQuery.
  *
  * Money/measure sums go through DECIMAL so results are exact and
  * reproducible regardless of partitioning / aggregation order — a double
  * sum would drift between runs (and between engines) at 100 TB.
  */
object Analytics {

  /** Exact, order-insensitive sum of a double measure: cast each value to
    * DECIMAL (deterministic per-row), sum exactly, return as double.
    */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(24,$scale)")).cast("double")

  /** Q1 — the dashboard day-slice query
    * (`/root/reference/visualization/app.py:40-51`): projection + timestamp
    * range predicate + total sort. Filter and projection push down to the
    * parquet scan; the only shuffle is the final range-partitioned sort.
    */
  def daySlice(df: DataFrame, tsCol: String, startTs: String, endTs: String,
      cols: Seq[String], tieBreak: String): DataFrame =
    df.select(cols.map(col).toIndexedSeq: _*)
      .filter(col(tsCol) >= lit(startTs).cast("timestamp") &&
        col(tsCol) <= lit(endTs).cast("timestamp"))
      .orderBy(col(tsCol), col(tieBreak))

  /** Day bounds for the dashboard slice (F4): the reference computes the
    * civil day in a FIXED UTC+2 offset (deliberately not Helsinki DST —
    * `/root/reference/visualization/app.py:17-18, 32-36`) and converts to
    * UTC instants. Returns [startInclusive, endInclusive] with
    * microsecond-resolution end, driver-side `java.time` math.
    */
  def dayBoundsUtc(civilDate: java.time.LocalDate,
      offsetHours: Int = 2): (java.sql.Timestamp, java.sql.Timestamp) = {
    val startUtc = civilDate.atStartOfDay().minusHours(offsetHours)
    val endUtc = startUtc.plusDays(1).minusNanos(1000)
    (java.sql.Timestamp.valueOf(startUtc), java.sql.Timestamp.valueOf(endUtc))
  }

  /** Hourly tumbling aggregate (W5/C3): the batch form of the reference's
    * floor-to-hour loading spec. Partial aggregation map-side; one shuffle
    * on the (coarse) hour key.
    */
  def hourlyAgg(df: DataFrame, tsCol: String, measure: String): DataFrame =
    df.groupBy(date_trunc("hour", col(tsCol)).cast("timestamp_ntz").as("hour"))
      .agg(count(lit(1)).as("n"), exactSum(col(measure)).as("sum_value"))
      .orderBy("hour")

  /** Star-schema rollup: fact joined through two dimension hops, aggregated
    * by the coarsest attribute. Dimensions are tiny → explicit broadcast so
    * the fact table never shuffles for the joins; the single shuffle is the
    * final 5-group aggregate.
    */
  def revenueByRegion(orders: DataFrame, customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        orders("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(exactSum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name")

  /** Top-k entities by an exact-summed measure. Aggregate first (shuffle on
    * the key), then a k-row sort — never a global sort of the fact.
    */
  def topKByMeasure(fact: DataFrame, key: String, measure: String, k: Int): DataFrame =
    fact.groupBy(key)
      .agg(exactSum(col(measure)).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("revenue").desc, col(key))
      .limit(k)

  /** Per-key running total (window-function surface). DECIMAL accumulator →
    * result independent of the window implementation's summation tree.
    */
  def runningTotal(df: DataFrame, key: String, tsCol: String, measure: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(key),
      sum(col(measure).cast("decimal(24,2)")).over(w).cast("double").as("running_value"))
  }

  /** A3 — per-key partition summary (`transformations.py:107-115` builds
    * per-station sorted tables; at scale that materializes as
    * `write.partitionBy(key)` — see [[writePartitioned]]). The queryable
    * summary: per-key count + time extent.
    */
  def partitionSummary(df: DataFrame, key: String, tsCol: String): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("n"), min(col(tsCol)).as("min_ts"), max(col(tsCol)).as("max_ts"))
      .orderBy(key)

  /** A3's materialization: hive-style partitioned, sorted-within-partition
    * parquet — the scalable rendering of "dict of per-station sorted frames".
    */
  def writePartitioned(df: DataFrame, key: String, tsCol: String, path: String): Unit =
    df.repartition(col(key))
      .sortWithinPartitions(key, tsCol)
      .write.mode("overwrite").partitionBy(key).parquet(path)

  /** F6/D3 batch form — per-key watermark freshness filter
    * (`/root/reference/src/data_processing/kafka_stream.py:269-273`): given a
    * state relation `(key, wm)` of already-ingested high-water marks, keep
    * only records strictly newer than their key's mark; unseen keys pass.
    * State side is small (one row per key) → broadcast left join, the
    * incoming batch never shuffles.
    */
  def watermarkFilter(batch: DataFrame, state: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val st = broadcast(state.withColumnRenamed(tsCol, "__wm"))
    batch.join(st, Seq(key), "left")
      .filter(col("__wm").isNull || col(tsCol) > col("__wm"))
      .drop("__wm")
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: for each (from, to) adjacent pair in `typeCol` ordered by
    * (`tsCol`, `tieCol`) within an entity, the pair count and the
    * conditional probability P(to | from) as an exact double division of
    * two exact counts.
    *
    * Scale shape: the only window runs PER ENTITY (`keyCol` partitions —
    * bounded by one entity's activity, never the corpus); the matrix is a
    * (from, to) aggregate whose output is ≤ |event types|², and the
    * per-from totals derive from the matrix itself (tiny) and broadcast
    * back for the ratio. The raw log is read once.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(typeCol), col(tsCol), col(tieCol))
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("__n_from"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__n_from").cast("double")).as("p"))
  }

  /** Linear multi-touch attribution: each purchase's value is split
    * EQUALLY across the user's qualifying views (at-or-before the
    * purchase, within `windowDays`), then rolled up by the view's
    * hour-of-day — "which hours' impressions actually convert", the
    * multi-touch complement of q32's last-touch as-of join. Credits are
    * integer micro-units rounded PER (purchase, hour) cell — round(v·c/n)
    * — so the rollup is a summation-order-independent BIGINT aggregate.
    *
    * Scale shape: the view×purchase pair join is an EQUI join on the
    * user (hash/SMJ, never a nested loop) with the time window as a
    * residual condition, so pair volume is bounded by per-user activity
    * within the window, the q32/q130 contract; everything after is a
    * ≤ 24-row rollup.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, viewType: String,
      purchaseType: String, windowDays: Int,
      purchaseIdCol: String = "event_id"): DataFrame = {
    val micros = (c: Column) => unix_micros(c.cast("timestamp"))
    val windowMicros = windowDays.toLong * 86400L * 1000000L
    val v = events.filter(col(typeCol) === viewType)
      .select(col(userCol).as("u"), micros(col(tsCol)).as("vt"),
        hour(col(tsCol).cast("timestamp")).as("view_hour"))
    val p = events.filter(col(typeCol) === purchaseType &&
        col(valueCol).isNotNull)
      .select(col(userCol).as("u"), col(purchaseIdCol).as("pid"),
        micros(col(tsCol)).as("pt"),
        round(col(valueCol) * 1e6).cast("long").as("v_micro"))
    val pairs = p.as("p").join(v.as("v"),
        col("p.u") === col("v.u")
          && col("v.vt") <= col("p.pt")
          && col("v.vt") >= col("p.pt") - windowMicros)
      .select(col("p.pid").as("pid"), col("p.v_micro").as("v_micro"),
        col("v.view_hour").as("view_hour"))
    val perPurchase = pairs.groupBy("pid", "v_micro")
      .agg(count(lit(1)).as("n_views"))
    val perCell = pairs.groupBy("pid", "view_hour")
      .agg(count(lit(1)).as("c_h"))
      .join(perPurchase, "pid")
      .select(col("view_hour"),
        round(col("v_micro") * col("c_h") / col("n_views")).cast("long")
          .as("credit_micro"))
    perCell.groupBy("view_hour")
      .agg(count(lit(1)).as("n_cells"),
        sum(col("credit_micro")).as("attributed_micro"))
  }
}
