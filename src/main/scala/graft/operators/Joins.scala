package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable non-equi joins.
  *
  * Spark plans a plain `fact JOIN dims ON v >= lo AND v < hi` as a
  * (Broadcast)NestedLoopJoin — every fact row probes every interval,
  * O(|fact|·|dims|), a scale-killer once the interval side outgrows a
  * broadcast. The standard fix is to manufacture an equi-join key both
  * sides can agree on: fixed-width buckets.
  */
object Joins {

  /** Range join `fact.v ∈ [dim.lo, dim.hi)` via covering-bucket
    * equi-join:
    *
    *   - each fact row computes its single bucket `floor(v / w)`;
    *   - each interval replicates into the buckets it overlaps
    *     (`floor(lo/w) .. floor(hi/w)` — ~(hi-lo)/w rows);
    *   - an EQUI-join on the bucket id (hash-shuffled or broadcast like
    *     any other join — never a nested loop) produces candidates, and
    *     the residual range predicate confirms exactly.
    *
    * Cost tuning: `bucketWidth` trades interval replication
    * (~width of interval / w rows per dim) against candidate
    * false-positives (fact rows matched to a bucket but outside the
    * interval). A width near the median interval length keeps both ~O(1).
    * Inner-join semantics; a NULL fact value or NULL bounds never match.
    * Bounds must satisfy lo <= hi.
    */
  def rangeJoin(fact: DataFrame, valCol: String, dims: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val fb = fact.withColumn("__bkt",
      floor(col(valCol) / bucketWidth).cast("long"))
    val db = dims.withColumn("__bkt", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    fb.join(db, Seq("__bkt"))
      .filter(col(valCol) >= col(loCol) && col(valCol) < col(hiCol))
      .drop("__bkt")
  }
}
