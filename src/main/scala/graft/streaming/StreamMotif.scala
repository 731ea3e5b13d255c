package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming contiguous-motif counting — the streaming twin of
  * [[graft.operators.Temporal.motifCount]], over an out-of-order
  * event-time stream with watermark-bounded lateness (reference
  * analogue: the stream-processing topology's stateful per-key
  * operators, `mp4/src/...` — same keyed-state-over-a-stream shape,
  * here with event-time reordering).
  *
  * Contiguity needs a TOTAL per-key order, which a stream only has
  * retrospectively: an event is orderable once the watermark passes
  * it, because any later arrival below the watermark is dropped as
  * late and any arrival above it sorts after. So the operator buffers
  * each key's events that are still above the watermark, and on every
  * invocation FINALIZES the prefix at or below it (sorted by
  * (event-time, id) — the same tie-break as the batch operator),
  * counts motif occurrences in (carry ++ finalized), emits the count
  * as an append-mode delta row, and keeps the last `motif.size - 1`
  * finalized types as carry so occurrences straddling a finalization
  * boundary are counted exactly once. Σ deltas per key ≡ the batch
  * count restricted to events at or below the FINAL watermark — the
  * emission-frontier contract every other st row states, replayed by
  * the oracle in the same truncating millisecond arithmetic Spark's
  * watermark uses (`floor(us/1000)`; max event ms − delay ms).
  *
  * State per key is O(delay-window events + |motif|): the pending
  * buffer only holds events the watermark has not yet passed, so a
  * hot key's state is bounded by its arrival rate × delay, never its
  * history. Flushes are driven by data arrivals and by event-time
  * timeouts (set to just below the earliest pending event, clamped
  * past the current watermark), so the final no-data micro-batch
  * drains every key the last watermark advance made finalizable.
  * Keys are never removed — carry must survive idle gaps; a
  * production deployment with unbounded key churn would add a TTL
  * timeout on top (the [[Membership]] cleanup pattern).
  */
object StreamMotif {

  /** One input event: `ts` is the watermarked TimestampType column
    * (kept so the watermark node's event-time attribute survives into
    * the stateful operator), `us` its epoch-microsecond twin the
    * ordering and finalization arithmetic use.
    */
  case class MotifEvent(user_id: Long, ts: java.sql.Timestamp, us: Long,
                        event_id: Long, event_type: String)

  case class Pending(us: Long, id: Long, ty: String)

  case class MotifState(pending: Seq[Pending], carry: Seq[String])

  /** Append-mode delta: `n` motif occurrences newly finalized for the
    * key (only emitted when positive).
    */
  case class MotifDelta(user_id: Long, n: Long)

  def deltas(events: Dataset[MotifEvent],
             motif: Seq[String]): Dataset[MotifDelta] = {
    require(motif.nonEmpty, "motif must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    val m = motif.toList
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[MotifEvent], gs: GroupState[MotifState]) => {
          val wm = gs.getCurrentWatermarkMs()
          val prior = gs.getOption.getOrElse(MotifState(Nil, Nil))
          // drop late rows ourselves (same ms-truncation rule as the
          // finalize predicate): the finalized prefix is immutable, a
          // late row merged behind it would corrupt contiguity
          val fresh = it.filter(_.us / 1000 > wm)
            .map(e => Pending(e.us, e.event_id, e.event_type)).toSeq
          val (fin, rest) = (prior.pending ++ fresh)
            .sortBy(e => (e.us, e.id))
            .partition(_.us / 1000 <= wm)
          val seq = prior.carry ++ fin.map(_.ty)
          // carry is shorter than the motif, so every window here has
          // at least one newly finalized element — nothing recounts
          val hits = seq.sliding(m.size).count(_.toList == m).toLong
          gs.update(MotifState(rest, seq.takeRight(m.size - 1)))
          if (rest.nonEmpty) {
            // fire once the watermark REACHES the earliest pending
            // event (timeouts fire strictly past the set ts, so set it
            // one below); clamp past the current watermark as the API
            // requires
            gs.setTimeoutTimestamp(
              math.max(rest.map(_.us / 1000).min - 1, wm + 1))
          }
          if (hits > 0) Iterator.single(MotifDelta(uid, hits))
          else Iterator.empty
        })(Encoders.product[MotifState], Encoders.product[MotifDelta])
  }
}
