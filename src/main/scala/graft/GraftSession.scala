package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table-loading helpers shared by the library, Verify, Bench and
  * tests.
  *
  * Design notes for scale (the engine targets a 1000-executor cluster even
  * though CI runs `local[32]`):
  *   - shuffle partitions default to the local core count (32) instead of
  *     Spark's 200; on a real cluster this is expected to be overridden to
  *     ~2-3x total cores.
  *   - AQE is on: runtime coalescing of shuffle partitions + skew-join
  *     splitting replace hand-tuned partition counts at 100 TB.
  *   - session time zone is pinned to UTC (the reference normalizes all
  *     timestamps to UTC — /root/reference/src/data_processing/fmi_client.py:168).
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver-generated events table stores TIMESTAMP(NANOS) which the
      // Parquet reader otherwise rejects; read as long and convert (see table()).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver-generated test tables from a scale-factor dir.
    *
    * `events.ts` is TIMESTAMP(NANOS) in parquet; with nanosAsLong it arrives
    * as a Long of epoch-nanos. Truncate to microseconds (integer `div`, the
    * same truncation DuckDB's reader applies) and expose as a proper
    * TimestampType so downstream operators and the DuckDB oracle agree.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // timestamp_ntz: DuckDB (the correctness oracle) reads parquet
      // timestamps as naive, and Spark 4 likewise infers NTZ for the other
      // testdata tables (inferTimestampNTZ) — keep one timestamp flavor.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
}
