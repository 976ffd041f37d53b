package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path.
  *
  * First line of defense is AQE (enabled in GraftSession): runtime skew-join
  * splitting and partition coalescing. These helpers cover the residual
  * cases AQE cannot fix:
  *   - a broadcast-ineligible join where a handful of keys dominate →
  *     [[saltedJoin]] spreads each hot key across `salts` partitions;
  *   - a high-cardinality aggregation with hot keys → [[saltedAggregate]]
  *     forces an explicit two-phase (partial on (key, salt), final on key),
  *     useful where the planner's map-side partial aggregation degrades
  *     (e.g. distinct-style aggregates).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a `small`-but-not-
    * broadcastable side: big rows get a deterministic salt from their full
    * row hash; the small side is exploded `salts` times so every
    * (key, salt) bucket can meet its match. Result equals the plain join,
    * but each hot key spreads over `salts` shuffle partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val expanded = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(expanded, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation with explicit salting: sums/counts per
    * (key, salt) first (spreads hot keys), then combines per key.
    * `measures` maps output column name → column to sum.
    */
  def saltedAggregate(df: DataFrame, key: String, salts: Int,
      measures: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        measures.map { case (n, c) => sum(c).as(s"__sum_$n") }.toSeq: _*)
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        measures.keys.map(n => sum(col(s"__sum_$n")).as(n)).toSeq: _*)
  }

  /** SALT PLANNER — turns q170's skew DIAGNOSIS into q76's skew
    * PRESCRIPTION: per join/aggregation key, how many salts does this
    * key need so no single task sees more than `targetPerKey` of its
    * rows? salts = ceil(count/target) (exact integer arithmetic), 1 for
    * keys already under the target. The emitted plan is what a 100 TB
    * job feeds [[saltedJoin]]/[[saltedAggregate]] per-key instead of a
    * one-size-fits-all salt count (over-salting the long tail multiplies
    * the small side of a salted join for no benefit).
    *
    * Scale shape: one map-side-combined count aggregate to the key grid
    * plus a 1-row total broadcast back; output the `topK` hottest keys
    * (count desc, key) — the full grid never leaves the cluster.
    * Returns (key, n_rows, share_micro, salts, is_hot).
    */
  def saltPlanner(df: DataFrame, keyCol: String, targetPerKey: Long,
      topK: Int): DataFrame = {
    require(targetPerKey >= 1 && topK >= 1)
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum("n_rows").cast("long").as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        expr("(n_rows * 1000000L) div __t").as("share_micro"),
        expr(s"(n_rows + ${targetPerKey}L - 1L) div ${targetPerKey}L")
          .as("salts"),
        (col("n_rows") > targetPerKey).as("is_hot"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }
}
