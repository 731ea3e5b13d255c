package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document deduplication — the streaming twin of the batch
  * `operators.Dedup` family, for pipelines that ingest training data
  * continuously instead of in snapshots.
  *
  * Batch exact-dedup keeps O(distinct docs) state forever; a stream
  * can't. `dropDuplicatesWithinWatermark` bounds the fingerprint state
  * to the watermark horizon: a duplicate arriving within `horizon` of
  * its first copy is dropped, one arriving later (state expired) is
  * re-emitted — the standard dedup-window contract of log ingestion
  * systems. State is a TTL'd hash set keyed by fingerprint, shuffled
  * once on the fingerprint (uniform, skew-free).
  */
object StreamingDedup {

  /** Exact streaming dedup on an md5 content fingerprint. */
  def exact(docs: DataFrame, textCol: String, tsCol: String,
            horizon: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Near-dup streaming dedup: same state machine keyed on the 64-bit
    * SimHash fingerprint, so trivially-perturbed copies (same simhash)
    * also collapse. Computing simhash per row needs the token votes in
    * expression land — one projection, no extra shuffle.
    */
  def simhash(docs: DataFrame, textCol: String, tsCol: String,
              horizon: String = "1 hour"): DataFrame =
    withSimhash(docs, textCol)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Adds the per-row 64-bit SimHash as `fp` via the native `simhash64`
    * expression (graft.functions.SimHash64) — one fused vote loop over
    * the materialized token-hash array, bit-for-bit the same
    * fingerprint as the batch `Dedup.simhashFingerprints` groupBy AND
    * the composed 64-fold form below (both spec-asserted), since votes
    * are associative/commutative sums per token occurrence.
    */
  def withSimhash(docs: DataFrame, textCol: String): DataFrame =
    withTokenHashes(docs, textCol)
      .withColumn("fp", call_function("simhash64", col("__hs")))
      .drop("__toks", "__hs")

  /** The composed HOF formulation withSimhash replaces: 64 independent
    * `aggregate()` folds over the token-hash array — O(64·tokens)
    * interpreted expression evals per row. Kept as the native
    * expression's differential-test twin (StreamingDedupSpec asserts
    * bit-equality), the pattern every native function in this engine
    * follows.
    */
  private[graft] def withSimhashComposed(docs: DataFrame, textCol: String): DataFrame = {
    val fp = (0 until 64).map { i =>
      val vote = aggregate(col("__hs"), lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    withTokenHashes(docs, textCol)
      .withColumn("fp", fp)
      .drop("__toks", "__hs")
  }

  private def withTokenHashes(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__toks", graft.operators.Dedup.wordsOf(textCol))
      .withColumn("__hs", transform(col("__toks"), t => xxhash64(t)))
}
