package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.streaming.Membership.{Heartbeat, MemberEvent}

/** The reference's failure-injection test harness
  * (`sim failtest`, `mp3/src/monitor.go:78-97`): gossip messages are
  * dropped at a configured percentage (`net.go:54-57`,
  * `rand.Intn(100) < dropRate`) and the detector's behavior under loss
  * is reported (messages sent/dropped, loss rate, failures detected).
  *
  * The drop decision here is a DETERMINISTIC twin — a keyed hash into
  * [0,100) instead of a PRNG — so a simulated schedule replays
  * identically across runs and executors (the reference's seedless
  * `rand` cannot), while preserving the ~uniform per-message drop
  * probability the sim needs.
  */
object FailureSim {

  /** Drop ~`dropRatePct`% of heartbeats, keyed-hash-deterministic.
    * net.go:54-57 semantics: a dropped message simply never arrives.
    */
  def dropMessages(hbs: Dataset[Heartbeat], dropRatePct: Int,
                   seed: Long = 0L): Dataset[Heartbeat] = {
    require(dropRatePct >= 0 && dropRatePct <= 100)
    val spark = hbs.sparkSession
    import spark.implicits._
    hbs.filter(
      pmod(xxhash64(lit(seed), col("memberId"), col("heartbeatCount"),
        col("eventTimeMs")), lit(100)) >= dropRatePct)
  }

  /** monitor.go:60-76's printed report, as data. `spuriousFailures` =
    * failure events for members that were never actually down (every
    * member in a sim keeps heartbeating; any `failed` is loss-induced).
    */
  case class LossReport(sent: Long, delivered: Long, dropped: Long,
                        lossRate: Double, failuresDetected: Long,
                        resurrections: Long)

  def report(sent: Dataset[Heartbeat], delivered: Dataset[Heartbeat],
             events: Seq[MemberEvent]): LossReport = {
    val nSent = sent.count()
    val nDelivered = delivered.count()
    val failed = events.count(_.kind == "failed")
    // members that re-appear after being failed — only possible
    // because merge mirrors the reference's verbatim-health update
    val resurrected = events.groupBy(_.memberId).values.count { evs =>
      evs.sortBy(_.atMs).map(_.kind).sliding(2).exists {
        case Seq("failed", k) => k != "removed"
        case _ => false
      }
    }.toLong
    LossReport(nSent, nDelivered, nSent - nDelivered,
      if (nSent == 0) 0.0 else (nSent - nDelivered).toDouble / nSent,
      failed, resurrected)
  }
}
