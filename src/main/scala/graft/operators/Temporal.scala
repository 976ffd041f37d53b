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
    *   `last(carry, ignoreNulls)` carries the most recent right ROW
    *   forward onto each left row. Rights sort before lefts at equal ts,
    *   so an exactly-simultaneous right row IS matched (ASOF `>=`).
    *
    * The carried payload is a single STRUCT of all right-side values (the
    * struct itself is null only on left rows), so a matched right row whose
    * value columns are genuinely NULL is still the row that wins — carrying
    * each value column separately with ignoreNulls would skip past it to an
    * older non-null value, diverging from ASOF semantics. A deterministic
    * tiebreak (hash of the right row's carried fields) orders multiple
    * right rows at the same (key, ts), so reruns pick the same winner
    * regardless of partitioning.
    *
    * `valueCols` are the right-side columns to carry; they must not
    * collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val carryType = StructType(valueCols.map(c =>
      right.schema(c).copy(nullable = true)).toArray)
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__carry", lit(null).cast(carryType))
    val r = right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__tie", xxhash64((col(rightTs) +: valueCols.map(col)): _*))
      .withColumn("__carry", struct(valueCols.map(col): _*))
    val rPadded = leftCols.filterNot(c => c == key).foldLeft(r) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val meta = Seq("__ts", "__side", "__tie", "__carry")
    val unioned = l.select((leftCols ++ meta).map(col).toIndexedSeq: _*)
      .unionByName(rPadded.select((leftCols ++ meta).map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__carry").getField(c))
    }.filter(col("__side") === 1).drop("__ts", "__side", "__tie", "__carry")
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
