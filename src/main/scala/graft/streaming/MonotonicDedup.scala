package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W1/F6/D3 — the reference's per-key strictly-monotonic watermark dedup
  * (`/root/reference/src/data_processing/kafka_stream.py:237-284`): each key
  * remembers the max event time it has ever emitted; a record passes only if
  * its time is STRICTLY greater (equal timestamps are duplicates and drop).
  *
  * Spark's built-in `withWatermark` is global-event-time and so cannot
  * express this; `flatMapGroupsWithState` holds the per-key max in the state
  * store. Properties inherited from Structured Streaming that the reference
  * hand-rolled:
  *   - state persists in the checkpoint (the reference's watermark JSON
  *     file, `kafka_stream.py:237-258`);
  *   - state only commits when the batch (including its sink writes inside
  *     the same query) succeeds — the reference's "no watermark advance on
  *     failed upload" (`kafka_stream.py:326-330`);
  *   - state is partitioned by key across executors, so the operator scales
  *     horizontally where the reference was a single-process dict.
  *
  * Also callable on a BATCH Dataset (state starts empty per key), which
  * makes the within-batch monotonic semantics directly unit-testable.
  */
object MonotonicDedup {

  /** Within a batch, records for a key are processed in ascending event
    * time; across batches the state carries the high-water mark. Returns
    * records that advanced their key's watermark.
    */
  def dedupe[K, V](ds: Dataset[V], key: V => K, eventTimeMillis: V => Long)(
      implicit ke: Encoder[K], ve: Encoder[V],
      tupleEnc: Encoder[(K, V)]): Dataset[V] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[V], state: GroupState[Long]) =>
          var hwm = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(eventTimeMillis).iterator.flatMap { v =>
            val t = eventTimeMillis(v)
            if (t > hwm) { hwm = t; Some(v) } else None
          }.toSeq
          if (out.nonEmpty) state.update(hwm)
          out.iterator
      }
  }
}
