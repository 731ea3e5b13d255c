package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Selection key for the bounded per-stratum top-k path
  * ([[graft.operators.CorpusMix.capPerStratumBounded]] /
  * `weightedSampleBounded`): rows race on (key asc, id asc), exactly
  * the ordering the window twins sort by.
  */
case class SelKey(key: Double, id: Long)

case class SelBuf(vs: Seq[SelKey])

/** Bounded-state "k smallest (key, id) pairs per group" — TopKAggregator's
  * selection-flavored sibling. Where the window formulation sorts EVERY
  * stratum in full to keep k rows (a near-total corpus sort when strata
  * are few and hot), this folds one row at a time into a sorted buffer
  * of at most k, merges partials map-side, and ships O(k) per group
  * through the shuffle. finish returns the full sorted bottom-k, so the
  * caller gets exact ranks for free (position in the buffer) and joins
  * winners back by id — no float is ever re-compared outside the
  * aggregator. Associative + commutative, safe under any partial
  * aggregation schedule; +Infinity keys (zero-weight rows) order last
  * and NaN cannot occur by construction of both callers.
  */
class BottomKSelect(k: Int) extends Aggregator[SelKey, SelBuf, SelBuf] {
  require(k > 0)

  private val ord: Ordering[SelKey] = Ordering.by(s => (s.key, s.id))

  override def zero: SelBuf = SelBuf(Vector.empty)

  private def bounded(vs: Seq[SelKey]): SelBuf = SelBuf(vs.sorted(ord).take(k))

  override def reduce(b: SelBuf, a: SelKey): SelBuf =
    if (b.vs.size < k || ord.lt(a, b.vs.last)) bounded(b.vs :+ a) else b

  override def merge(b1: SelBuf, b2: SelBuf): SelBuf = bounded(b1.vs ++ b2.vs)

  override def finish(r: SelBuf): SelBuf = r

  override def bufferEncoder: Encoder[SelBuf] = Encoders.product[SelBuf]
  override def outputEncoder: Encoder[SelBuf] = Encoders.product[SelBuf]
}
