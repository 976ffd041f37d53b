package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA (α = 1/2) with EXACT integer state — the
  * true-recursion complement of the batch operator
  * [[graft.operators.Temporal.ewmaTrailing]] (which uses a finite
  * 24-lag horizon because a batch window cannot run a recursion): a
  * stream CAN, because `flatMapGroupsWithState` carries the smoothed
  * value forward in the state store.
  *
  * State per key: the current smoothed value on the 1e6 micro grid.
  * Update per event (processed in ascending (eventTimeMillis, tie)
  * within a batch, state ordering across batches):
  *
  *   s' = (s + v_micro) div 2      (first event: s = v_micro)
  *
  * — α = ½ as a truncating integer average, so the state is ONE long
  * per key, bit-exact across retries/partitionings (same contract as
  * [[MonotonicDedup]]: state commits only with the batch). The
  * truncation bias is ≤ 1 micro-unit per event and NEVER compounds
  * past 1 (the recursion is a contraction).
  *
  * Emits one record per input event: (key, eventTimeMillis, v_micro,
  * ewma_micro AFTER absorbing the event). Also callable on a batch
  * Dataset (state starts empty), which makes the recursion directly
  * unit-testable.
  */
object StreamEwma {

  /** @param tie total-order tiebreak within equal timestamps (e.g. an
    *   event id) so replays absorb events in one deterministic order.
    */
  def smooth[K](ds: Dataset[(K, Long, Long, Long)])(
      implicit ke: Encoder[K],
      tupleEnc: Encoder[(K, Long, Long, Long)]): Dataset[(K, Long, Long, Long)] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // rows: (key, eventTimeMillis, tie, vMicro) → (key, t, vMicro, ewma)
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[(K, Long, Long, Long)], state: GroupState[Long]) =>
          var s = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { r =>
            s = if (s == Long.MinValue) r._4 else (s + r._4) / 2
            (k, r._2, r._4, s)
          }
          if (out.nonEmpty) state.update(s)
          out.iterator
      }
  }
}
