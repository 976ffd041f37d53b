package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k aggregator over (key, id) LONG pairs: keeps the k
  * smallest by (key, then id) under EXACT 64-bit comparison.
  *
  * Companion to [[TopKAggregator]] (which ranks by a Double score —
  * fine for cosines in [-1, 1], but a 60-bit hash key does NOT fit a
  * double's 53-bit mantissa, so hash-ranked sampling must compare
  * longs exactly or two close hashes collapse onto one double and the
  * selected set drifts from the oracle's integer ordering).
  *
  * Same scale contract as TopKAggregator: a k-element buffer per group
  * per task, partial aggregation map-side, so the shuffle carries at
  * most k rows per group per task instead of the whole group — this is
  * what replaces a per-stratum `row_number` window (which sorts each
  * stratum's entire corpus slice in a single task) in deterministic
  * hash-rank sampling.
  */
class MinKPairsAggregator(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {

  private def trim(buf: Array[(Long, Long)]): Array[(Long, Long)] = {
    val sorted = buf.sortBy(identity) // (key asc, id asc) — exact longs
    if (sorted.length <= k) sorted else sorted.take(k)
  }

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)],
      in: (Long, Long)): Array[(Long, Long)] =
    if (buf.length == k && Ordering[(Long, Long)].lt(buf.last, in)) buf
    else trim(buf :+ in)

  override def merge(a: Array[(Long, Long)],
      b: Array[(Long, Long)]): Array[(Long, Long)] = trim(a ++ b)

  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    Encoders.kryo[Array[(Long, Long)]]

  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
