package graft

import graft.streaming.{FailureSim, Membership}
import graft.streaming.Membership._

/** The reference's `sim failtest` (monitor.go:78-97 + net.go:54-57):
  * drop gossip messages at a configured rate and observe the failure
  * detector. The drop decision is a deterministic keyed hash, so every
  * schedule replays identically.
  */
class FailureSimSpec extends SparkSpecBase {

  private val Members = 4
  private val Ticks = 50
  private val IntervalMs = 100L
  private val FailAfterMs = 500L
  private val CleanupAfterMs = 1000L

  /** members × ticks heartbeats, counter = tick, t = tick·interval. */
  private def schedule = {
    val s = spark
    import s.implicits._
    (for {
      tick <- 0 until Ticks
      m <- 0 until Members
    } yield Heartbeat(m, s"10.0.0.$m", tick.toLong, Alive,
      tick * IntervalMs)).toDS()
  }

  /** Deterministic replay: per member, advance a clock in gossip
    * intervals, applying timeouts then the tick's delivered batch —
    * the pure-function twin of the streaming wiring.
    */
  private def replay(delivered: Seq[Heartbeat],
                     endTick: Long = Ticks.toLong): Seq[MemberEvent] =
    delivered.groupBy(_.memberId).values.flatMap { hs =>
      var st: Option[MemberState] = None
      val evs = Seq.newBuilder[MemberEvent]
      val byTick = hs.groupBy(_.eventTimeMs / IntervalMs)
      // replaying past endTick would "fail" every member at stream end;
      // the default horizon stops with the heartbeats
      for (tick <- 0L until endTick) {
        val now = tick * IntervalMs
        st.foreach { s =>
          val (ns, te) = Membership.onTimeout(s, now, FailAfterMs, CleanupAfterMs)
          st = ns; evs ++= te
        }
        val (ns, me) = Membership.merge(st, byTick.getOrElse(tick, Seq.empty))
        st = ns; evs ++= me
      }
      evs.result()
    }.toSeq

  test("0% drop: every message delivered, no failures detected") {
    val sent = schedule
    val delivered = FailureSim.dropMessages(sent, 0)
    val events = replay(delivered.collect().toSeq)
    val rep = FailureSim.report(sent, delivered, events)
    assert(rep.dropped == 0 && rep.lossRate == 0.0)
    assert(rep.failuresDetected == 0)
    assert(events.count(_.kind == "joined") == Members)
  }

  test("100% drop: nothing arrives, nothing joins") {
    val sent = schedule
    val delivered = FailureSim.dropMessages(sent, 100)
    assert(delivered.isEmpty)
    assert(replay(Seq.empty).isEmpty)
  }

  test("drop rate is honored within binomial tolerance and is deterministic") {
    val sent = schedule
    val delivered = FailureSim.dropMessages(sent, 30, seed = 7)
    val rep = FailureSim.report(sent, delivered, Seq.empty)
    assert(rep.sent == Members.toLong * Ticks)
    // 200 Bernoulli(0.3) trials: observed rate within ±10 points
    assert(math.abs(rep.lossRate - 0.30) < 0.10, s"loss ${rep.lossRate}")
    // keyed hash => identical drop set on re-evaluation
    val again = FailureSim.dropMessages(sent, 30, seed = 7)
    assert(delivered.collect().toSet == again.collect().toSet)
  }

  test("heavy loss induces spurious failures; survivors resurrect via " +
    "later gossip (reference verbatim-health merge)") {
    val sent = schedule
    val delivered = FailureSim.dropMessages(sent, 85, seed = 3)
    val events = replay(delivered.collect().toSeq)
    val rep = FailureSim.report(sent, delivered, events)
    // with P(gap >= failAfter) = 0.85^5 ≈ 0.44 per member-window,
    // spurious failures are statistically certain over 50 ticks × 4
    assert(rep.failuresDetected > 0, s"report $rep")
    // every member keeps heartbeating, so at least one failed member
    // must be seen again (higher counter resurrects, detector.go:198)
    assert(rep.resurrections > 0, s"report $rep")
  }
}
