package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** First-k labels of a group in exact (key1, key2) order — the bounded
  * replacement for "sort each group's whole history in one task, then
  * slice": collect_list + array_sort materializes an UNBOUNDED per-group
  * buffer (a power user's millions of events), while this keeps at most
  * k (keys, label) triples per group per task, partial-aggregated
  * map-side, so the shuffle carries ≤ k rows per group per task however
  * deep one entity's history runs. Keys are exact longs (e.g. micros
  * since epoch + a tiebreak id), so the selected prefix matches any
  * oracle's ORDER BY key1, key2 exactly.
  *
  * Same family as [[TopKAggregator]] / [[MinKPairsAggregator]]; the
  * buffer is a plain sorted array because k is small.
  */
class MinKOrderedStringsAggregator(k: Int)
    extends Aggregator[(Long, Long, String), Array[(Long, Long, String)], Seq[String]] {

  private implicit val ord: Ordering[(Long, Long, String)] =
    Ordering.by { case (a, b, _) => (a, b) }

  private def trim(buf: Array[(Long, Long, String)]): Array[(Long, Long, String)] = {
    val sorted = buf.sorted
    if (sorted.length <= k) sorted else sorted.take(k)
  }

  override def zero: Array[(Long, Long, String)] = Array.empty

  override def reduce(buf: Array[(Long, Long, String)],
      in: (Long, Long, String)): Array[(Long, Long, String)] =
    if (buf.length == k && ord.lt(buf.last, in)) buf // fast reject
    else trim(buf :+ in)

  override def merge(a: Array[(Long, Long, String)],
      b: Array[(Long, Long, String)]): Array[(Long, Long, String)] = trim(a ++ b)

  override def finish(buf: Array[(Long, Long, String)]): Seq[String] =
    buf.map(_._3).toSeq

  override def bufferEncoder: Encoder[Array[(Long, Long, String)]] =
    Encoders.kryo[Array[(Long, Long, String)]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
