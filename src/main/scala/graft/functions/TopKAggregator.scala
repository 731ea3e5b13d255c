package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` — the incremental form of the Juice surface
  * (SURVEY §2.9: "incremental version = Aggregator[IN,BUF,OUT]"): where
  * a Juice materializes a key's full value list, an Aggregator folds
  * one value at a time with a bounded buffer and merges partials
  * map-side, so the shuffle carries O(k) per group instead of O(values).
  *
  * TopK keeps the k largest doubles per group: buffer = sorted
  * descending Seq of at most k, reduce = bounded insert, merge =
  * bounded merge — associative + commutative, safe under any partial
  * aggregation schedule.
  */
case class TopKBuf(vs: Seq[Double])

class TopKAggregator(k: Int) extends Aggregator[Double, TopKBuf, TopKBuf] {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  private def bounded(vs: Seq[Double]): TopKBuf =
    TopKBuf(vs.sorted(Ordering[Double].reverse).take(k))

  override def reduce(b: TopKBuf, a: Double): TopKBuf =
    if (b.vs.size < k || a > b.vs.last) bounded(b.vs :+ a) else b

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    bounded(b1.vs ++ b2.vs)

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
