package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One Space-Saving counter: estimated count and its maximum
  * overestimation (`count - err` is a guaranteed lower bound on the true
  * frequency). */
final case class HeavyHitter(bucket: Int, token: String, count: Long, err: Long)

/** Streaming heavy hitters via Space-Saving (Metwally et al.) summaries
  * in `flatMapGroupsWithState` — the bounded-state answer to "top tokens
  * over an unbounded stream", where an exact `groupBy(token)` would grow
  * state with the vocabulary forever.
  *
  * The stream is partitioned into `buckets` hash groups; each group keeps
  * at most `m` counters (the classic admit/evict rule: a new token evicts
  * the current minimum and inherits its count as `err`). Because a token
  * hashes to exactly ONE bucket, the global summary is the plain union of
  * bucket summaries — no cross-bucket merge logic — and the Space-Saving
  * guarantees hold per bucket: any token with true bucket-frequency
  * > N_bucket/m is retained, with true <= count <= true + err and
  * err <= N_bucket/m.
  *
  * State per bucket is EXACTLY m counters regardless of stream length —
  * the property the spec pins. Each trigger emits every bucket's current
  * snapshot (Update mode); the consumer takes the global top-k by
  * `count`.
  */
/** Flat state row (encoder-codegen-friendly: no nested Map/tuple types). */
final case class SSCounter(token: String, count: Long, err: Long)

/** Space-Saving state: one bucket's counters. Top-level (not
  * object-nested) because the state encoder's generated code must
  * instantiate it by its own constructor. */
final case class SSState(counters: Seq[SSCounter])

object HeavyHitters {

  def topTokensStream(tokens: Dataset[String], buckets: Int, m: Int): Dataset[HeavyHitter] = {
    require(buckets > 0 && m > 0, s"buckets=$buckets, m=$m must be positive")
    implicit val stateEnc: Encoder[SSState] = Encoders.product[SSState]
    implicit val outEnc: Encoder[HeavyHitter] = Encoders.product[HeavyHitter]
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    tokens.groupByKey(t => math.floorMod(t.hashCode, buckets))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, it: Iterator[String], state: GroupState[SSState]) =>
          var s = state.getOption.map(_.counters.map(c => c.token -> (c.count, c.err)).toMap)
            .getOrElse(Map.empty[String, (Long, Long)])
          it.foreach { t =>
            s.get(t) match {
              case Some((c, e)) => s = s.updated(t, (c + 1, e))
              case None if s.size < m => s = s.updated(t, (1L, 0L))
              case None =>
                // evict the minimum (token tiebreak keeps this
                // deterministic) and inherit its count as the new
                // token's overestimation bound
                val (minTok, (minC, _)) = s.minBy { case (tk, (c, _)) => (c, tk) }
                s = (s - minTok).updated(t, (minC + 1, minC))
            }
          }
          state.update(SSState(
            s.toSeq.sortBy(_._1).map { case (t, (c, e)) => SSCounter(t, c, e) }))
          s.iterator.map { case (t, (c, e)) => HeavyHitter(bucket, t, c, e) }
      }
  }
}
