package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs: keeps the k largest by
  * (score, then smaller id wins ties) — `Aggregator[IN, BUF, OUT]`,
  * registrable with `functions.udaf` for DataFrame `groupBy().agg()`.
  *
  * Why this beats `row_number().over(Window)` for top-k at scale: the
  * window form shuffles EVERY scored row to its partition and sorts the
  * whole partition; the aggregator form keeps a k-element buffer per
  * group per task (partial aggregation map-side), so the shuffle carries
  * at most k rows per group per task — for knn over a billion-row corpus
  * that is the difference between shuffling the corpus and shuffling
  * k × tasks rows.
  *
  * The buffer is a plain sorted array: k is small (≤ ~100), so
  * insert-and-trim is cheaper than heap bookkeeping at these sizes.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  private def trim(buf: Array[(Double, Long)]): Array[(Double, Long)] = {
    // descending score, ascending id on ties — matches the window form's
    // orderBy(col("cos").desc, col("id"))
    val sorted = buf.sortBy { case (s, id) => (-s, id) }
    if (sorted.length <= k) sorted else sorted.take(k)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
      in: (Double, Long)): Array[(Double, Long)] =
    if (buf.length == k && (buf.last._1 > in._1 ||
        (buf.last._1 == in._1 && buf.last._2 < in._2))) buf // fast reject
    else trim(buf :+ in)

  override def merge(a: Array[(Double, Long)],
      b: Array[(Double, Long)]): Array[(Double, Long)] = trim(a ++ b)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    Encoders.kryo[Array[(Double, Long)]]

  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
