package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators the reference (and vanilla SQL) lack:
  * as-of joins and gap-based sessionization.
  */
object Temporal {

  /** As-of join: for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (time-series point-in-time
    * lookup; DuckDB's native `ASOF JOIN` is the oracle semantics).
    *
    * Implementation is the classic union + running-last-value window —
    * one shuffle on (key), no range explosion, no per-row binary search:
    *   tag sides → union → window ordered by (ts, side, tie) →
    *   `last(value, ignoreNulls)` carries the most recent right value
    *   forward onto each left row. Rights sort before lefts at equal ts,
    *   so an exactly-simultaneous right row IS matched (ASOF `>=`).
    *
    * `valueCols` are the right-side columns to carry; they must not
    * collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = valueCols.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val r = leftCols.filterNot(c => c == key).foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val unioned = l.select((leftCols ++ valueCols ++ Seq("__ts", "__side"))
        .map(col).toIndexedSeq: _*)
      .unionByName(r.select((leftCols ++ valueCols ++ Seq("__ts", "__side"))
        .map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Gap-based sessionization: events for a key belong to one session
    * while consecutive gaps stay within `gap`; a session ends `gap` after
    * its last event. Uses Spark's built-in `session_window` (merging
    * session aggregation — works in batch and streaming). One shuffle on
    * the key.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String, gap: String,
      measure: Column): DataFrame =
    df.groupBy(col(key), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(measure.cast("decimal(24,2)")).cast("double").as("sum_value"))
      .select(col(key), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
}
