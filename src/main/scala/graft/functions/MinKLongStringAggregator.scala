package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k aggregator over (key: Long, label: String) pairs in
  * exact (key, label) order — the string participates in the ordering,
  * unlike [[MinKOrderedStringsAggregator]] whose label is payload-only.
  * That makes it the right kernel for "top-k tokens by (count DESC,
  * token ASC)": feed (-count, token) and the buffer IS the ranked
  * prefix, deterministic under count ties.
  *
  * Same scale contract as the rest of the family: a k-element buffer per
  * group per task, partial aggregation map-side, so the shuffle carries
  * at most k rows per group per task — replacing a per-group
  * `row_number` window that would sort each group's whole vocabulary in
  * one task.
  */
class MinKLongStringAggregator(k: Int)
    extends Aggregator[(Long, String), Array[(Long, String)], Seq[(Long, String)]] {

  private implicit val ord: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long, Ordering.String)

  private def trim(buf: Array[(Long, String)]): Array[(Long, String)] = {
    val sorted = buf.sorted
    if (sorted.length <= k) sorted else sorted.take(k)
  }

  override def zero: Array[(Long, String)] = Array.empty

  override def reduce(buf: Array[(Long, String)],
      in: (Long, String)): Array[(Long, String)] =
    if (buf.length == k && ord.lt(buf.last, in)) buf // fast reject
    else trim(buf :+ in)

  override def merge(a: Array[(Long, String)],
      b: Array[(Long, String)]): Array[(Long, String)] = trim(a ++ b)

  override def finish(buf: Array[(Long, String)]): Seq[(Long, String)] =
    buf.toSeq

  override def bufferEncoder: Encoder[Array[(Long, String)]] =
    Encoders.kryo[Array[(Long, String)]]

  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
