package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Temporal.rollingMedianAnomaly`: per-key daily
  * volumes scored against the EXACT median of the trailing `window`
  * observed days, as the days arrive — the alerting form of the batch
  * audit (the batch query backfills history; this flags the anomaly the
  * moment the day closes).
  *
  * Reference behavior: Annikaattori's pipeline recomputes batch
  * aggregates per run; the streaming form keeps only what the next
  * decision needs.
  *
  * State per key is the last `window−1` daily counts (a bounded Seq of
  * longs — constant memory per key at ANY stream length; no
  * watermark-unbounded growth). Within a batch, rows are absorbed in
  * (day) order so replays are deterministic; the same integer median×2
  * and 4·cnt threshold tests as the batch operator, so the two faces
  * agree bit-for-bit on identical inputs (pinned in StreamingSpec).
  */
object StreamRollingMedian {

  final case class MedianState(counts: Seq[Long])

  final case class MedianOut(key: String, day: Long, cnt: Long,
      nWindow: Int, medianX2: Long, isAnomaly: Boolean)

  /** rows: (key, dayIndex, count) → one scored row per input day. */
  def monitor(ds: Dataset[(String, Long, Long)], window: Int = 7)(
      implicit outEnc: Encoder[MedianOut]): Dataset[MedianOut] = {
    require(window >= 1, "window must be >= 1")
    implicit val stateEnc: Encoder[MedianState] = Encoders.product[MedianState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val warmup = (window + 1) / 2
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[MedianState]) =>
          var hist = state.getOption.map(_.counts.toVector)
            .getOrElse(Vector.empty[Long])
          val out = rows.toSeq.sortBy(_._2).map { case (_, day, cnt) =>
            val win = (hist :+ cnt).takeRight(window).sorted
            val n = win.size
            val m2 = win((n + 1) / 2 - 1) + win((n + 2) / 2 - 1)
            val anom = n >= warmup && (cnt * 4 > m2 * 3 || cnt * 4 < m2)
            hist = (hist :+ cnt).takeRight(window - 1)
            MedianOut(k, day, cnt, n, m2, anom)
          }
          if (out.nonEmpty) state.update(MedianState(hist))
          out.iterator
      }
  }
}
