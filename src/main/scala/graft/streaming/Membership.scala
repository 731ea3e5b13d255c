package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gossip-membership state semantics (SURVEY.md §2.8 ST1–ST5) from the
  * reference's failure detector (`mp3/src/detector.go:112-227`), as a
  * Structured Streaming stateful operator.
  *
  * Merge rules (ST1, HeartbeatHandler `detector.go:196-216`, mirrored
  * exactly):
  *  - an entry updates iff NOT (received counter <= local counter AND
  *    received health != Left) and NOT (both sides Failed) — so
  *    stale/duplicate gossip is idempotently ignored (ST5), `Left`
  *    propagates regardless of counter, and — as in the reference — a
  *    falsely-Failed local entry IS resurrected by higher-counter
  *    gossip, and a Left member rejoins via a higher counter;
  *  - the received health is taken verbatim on update (a received
  *    Failed with a higher counter marks the local entry Failed);
  *  - an unknown member arriving already-`Failed` is not added.
  * The reference's state write refreshes the timestamp even when
  * nothing observable changed (duplicate Left gossip); we apply the
  * same state write but emit a lifecycle event only when counter or
  * health actually changed, since our event stream is the derived
  * output, not the state table.
  * Timeouts: no update within `failAfterMs` marks the member Failed
  * (ST2, `FailMember`); a further `cleanupAfterMs` removes the state
  * entirely (ST3, `CleanupMember`).
  *
  * The transition logic is pure (`merge` / `onTimeout`) so tests can
  * replay any schedule deterministically; the streaming wiring is
  * `flatMapGroupsWithState` keyed by member id with event-time
  * timeouts driven by the watermark (ST4's heartbeat tick becomes any
  * event-time source, e.g. `rate` in the demo below).
  */
object Membership {

  final val Alive = 0
  final val Failed = 1
  final val Left = 2

  case class Heartbeat(memberId: Int, ip: String, heartbeatCount: Long,
                       health: Int, eventTimeMs: Long)
  case class MemberState(memberId: Int, ip: String, heartbeatCount: Long,
                         lastUpdateMs: Long, health: Int)
  /** kind: joined | updated | left | failed | removed */
  case class MemberEvent(memberId: Int, kind: String, heartbeatCount: Long,
                         health: Int, atMs: Long)

  /** ST1 + ST5: fold a batch of heartbeats into the state. Pure. */
  def merge(state: Option[MemberState], hbs: Seq[Heartbeat]): (Option[MemberState], Seq[MemberEvent]) = {
    var st = state
    val events = Seq.newBuilder[MemberEvent]
    hbs.sortBy(h => (h.eventTimeMs, h.heartbeatCount)).foreach { h =>
      st match {
        case None =>
          // never ADD an entry that is already failed (detector.go:206-210)
          if (h.health != Failed) {
            st = Some(MemberState(h.memberId, h.ip, h.heartbeatCount,
              h.eventTimeMs, h.health))
            events += MemberEvent(h.memberId,
              if (h.health == Left) "left" else "joined",
              h.heartbeatCount, h.health, h.eventTimeMs)
          }
        case Some(s) =>
          // detector.go:198-204: skip stale counters (unless Left, which
          // always applies) and Failed-onto-Failed; otherwise write the
          // received entry VERBATIM — including resurrection of a
          // falsely-Failed entry by a higher counter.
          val staleCounter = h.heartbeatCount <= s.heartbeatCount && h.health != Left
          val bothFailed = h.health == Failed && s.health == Failed
          if (!staleCounter && !bothFailed) {
            val observable = h.heartbeatCount != s.heartbeatCount || h.health != s.health
            st = Some(MemberState(h.memberId, h.ip, h.heartbeatCount,
              h.eventTimeMs, h.health))
            if (observable) {
              val kind = h.health match {
                case Left => "left"
                case Failed => "failed"
                case _ => "updated"
              }
              events += MemberEvent(h.memberId, kind, h.heartbeatCount,
                h.health, h.eventTimeMs)
            }
          } // else: stale or duplicate gossip, idempotent no-op (ST5)
      }
    }
    (st, events.result())
  }

  /** ST2 + ST3: what happens when the clock passes a deadline. Pure.
    * Returns the surviving state (if any) and emitted events.
    */
  def onTimeout(s: MemberState, nowMs: Long, failAfterMs: Long,
                cleanupAfterMs: Long): (Option[MemberState], Seq[MemberEvent]) =
    // only ALIVE entries are failure-detected (`detector.go:123`
    // guards `currEntry.Health == Alive` before marking Failed): a
    // member that announced voluntary departure ages straight to
    // removal — emitting "failed" for it would be a spurious loss
    // signal (FailureSim counts every "failed" as loss-induced) and
    // would overwrite the Left status its removal event should carry
    if (s.health == Alive && nowMs - s.lastUpdateMs >= failAfterMs) {
      val failed = s.copy(health = Failed)
      (Some(failed), Seq(MemberEvent(s.memberId, "failed", s.heartbeatCount, Failed, nowMs)))
    } else if (s.health != Alive && nowMs - s.lastUpdateMs >= failAfterMs + cleanupAfterMs) {
      // Failed AND Left entries share the reference's cleanup timing
      // (FailMember schedules CleanupMember for Left entries too,
      // without the fail transition); the removal event reports the
      // entry's own terminal health
      (None, Seq(MemberEvent(s.memberId, "removed", s.heartbeatCount, s.health, nowMs)))
    } else (Some(s), Seq.empty)

  /** Streaming wiring: heartbeats (with an `eventTime` timestamp column
    * derived from eventTimeMs) → member lifecycle events. Works on any
    * watermarked stream; state is O(live members).
    */
  def updates(heartbeats: Dataset[Heartbeat], failAfterMs: Long,
              cleanupAfterMs: Long, watermarkDelay: String = "10 seconds"): Dataset[MemberEvent] = {
    val spark = heartbeats.sparkSession
    import spark.implicits._
    heartbeats
      .withColumn("eventTime",
        org.apache.spark.sql.functions.timestamp_millis($"eventTimeMs"))
      .withWatermark("eventTime", watermarkDelay)
      .as[Heartbeat]
      .groupByKey(_.memberId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (id: Int, hbs: Iterator[Heartbeat], gs: GroupState[MemberState]) => {
          val prior = gs.getOption
          val batch = hbs.toSeq
          val (afterTimeout, timeoutEvents) =
            if (gs.hasTimedOut && prior.isDefined)
              onTimeout(prior.get, gs.getCurrentWatermarkMs(),
                failAfterMs, cleanupAfterMs)
            else (prior, Seq.empty[MemberEvent])
          val (next, mergeEvents) = merge(afterTimeout, batch)
          next match {
            case Some(s) =>
              gs.update(s)
              val deadline = s.lastUpdateMs +
                (if (s.health == Failed) failAfterMs + cleanupAfterMs else failAfterMs)
              // event-time timeouts must be >= watermark; clamp forward
              gs.setTimeoutTimestamp(math.max(deadline, gs.getCurrentWatermarkMs() + 1))
            case None => gs.remove()
          }
          (timeoutEvents ++ mergeEvents).iterator
        })
  }

  /** ST4 heartbeat generator: maps a monotone tick stream with the
    * `rate` source's shape (`value: long, timestamp`) to round-robin
    * member heartbeats, counter = tick/members. Factored out of the
    * demo so MembershipSpec can drive the SAME pipeline from a
    * MemoryStream and assert the emitted lifecycle events.
    */
  def tickHeartbeats(ticks: org.apache.spark.sql.DataFrame, members: Int): Dataset[Heartbeat] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(
        ($"value" % members).cast("int").as("memberId"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("10.0.0."), ($"value" % members).cast("string")).as("ip"),
        ($"value" / members).cast("long").as("heartbeatCount"),
        org.apache.spark.sql.functions.lit(Alive).as("health"),
        org.apache.spark.sql.functions.unix_millis($"timestamp").as("eventTimeMs"))
      .as[Heartbeat]
  }

  /** ST4 demo: the `rate`-source tick generator feeding `updates`,
    * printed to console. A self-contained runnable gossip-membership
    * pipeline; the testable core is `tickHeartbeats` + `updates`.
    */
  def demo(spark: SparkSession, members: Int = 5): org.apache.spark.sql.streaming.StreamingQuery = {
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", "10").load()
    updates(tickHeartbeats(ticks, members), failAfterMs = 2000, cleanupAfterMs = 5000)
      .writeStream.format("console").outputMode("append").start()
  }
}
