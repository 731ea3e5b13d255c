package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The streaming twin of the d5 batch cleaning pipeline: continuously
  * ingested documents are exact-deduped within the watermark horizon
  * (TTL'd fingerprint state, `StreamingDedup`), quality-scored
  * (single-pass projection, `TextAnalysis.withQuality`), and filtered
  * — yielding the clean append stream a training pipeline writes to
  * its corpus store. Composition of the engine's existing operators;
  * one stateful stage (the dedup), everything else stateless.
  *
  * Column contract: the input must not already carry `fp` (the dedup
  * stage's fingerprint, consumed and dropped here) or the quality
  * feature names (`n_tokens`, `punct_ratio`, `stopword_ratio`,
  * `mean_token_len`, `quality`), which are appended to the output.
  */
object StreamingCorpusClean {

  def clean(docs: DataFrame, textCol: String, tsCol: String,
            horizon: String = "1 hour",
            minQuality: Double = 0.5): DataFrame =
    TextAnalysis.withQuality(
        StreamingDedup.exact(docs, textCol, tsCol, horizon), textCol)
      .filter(col("quality") >= minQuality)
      .drop("fp")
}
