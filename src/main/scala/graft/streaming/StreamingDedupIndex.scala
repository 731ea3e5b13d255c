package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex}

/** Streaming probe of the at-rest [[DedupIndex]]: flag documents in an
  * incoming stream that near-duplicate the already-ingested corpus,
  * without ever re-fingerprinting or re-scanning that corpus. The
  * streaming twin of [[DedupIndex.probePairs]] (the d6 batch row), and
  * the front door a continuous-ingest pipeline actually needs: batch
  * builds/compacts the index nightly; this runs on the firehose.
  *
  * All stream-side work is stateless projections plus STREAM-STATIC
  * joins (both fully supported by Structured Streaming — the static
  * index side is re-read per microbatch, which is exactly the "index
  * at rest" contract):
  *
  *   1. per-row MinHash signature via the native `minhash_row`
  *      expression (bit-equal to the batch signature, so band hashes
  *      collide with the index's — the property MinHashRowSpec pins);
  *   2. band explode → stream-static join against `bands/`;
  *   3. collapse multi-band hits with
  *      `dropDuplicatesWithinWatermark(doc, match_doc)` (state TTL'd
  *      by the watermark, like [[StreamingDedup]]);
  *   4. verify by SIGNATURE AGREEMENT against `sigs/`: est_jaccard =
  *      matching positions / numHashes, the standard unbiased MinHash
  *      estimator (stderr ≈ sqrt(J(1−J)/k), ~0.03 at k=128) — exact
  *      shingle verification would need corpus texts, which a stream
  *      must not scan per microbatch. Batch re-verification of the
  *      (tiny) flagged output is the exactness path if needed.
  */
object StreamingDedupIndex {

  /** (doc, match_doc, est_jaccard) for every streaming doc whose
    * estimated Jaccard against an indexed doc clears `minEstJaccard`.
    * `stream` must be a streaming DataFrame with `idCol`, `textCol`,
    * and event-time `tsCol` (watermarked here with `horizon`).
    */
  def matches(spark: SparkSession, path: String, stream: DataFrame,
              tsCol: String, horizon: String = "1 hour",
              minEstJaccard: Double = 0.8,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (n, bands, rows, _) = DedupIndex.meta(spark, path)
    val k = bands * rows
    // Drop docs shorter than n words BEFORE signing (their sig would be
    // null; the batch path emits no row for them either). NOT a
    // `sig.isNotNull` post-filter: Catalyst pushes that predicate below
    // the signature projection, inlining the whole minhash_row(...)
    // tree — with the tokenization re-evaluated per array element —
    // into a Filter at the scan, recomputing every signature in
    // quadratic form (measured 8.9s vs 0.6s on a 4750-doc microbatch).
    val enough = stream.filter(size(Dedup.wordsOf(textCol)) >= n)
    val signed = Dedup.withMinhashSignature(enough, textCol, "sig", n, k)
      .select(col(idCol).as("doc"), col("sig"), col(tsCol).as("__ts"))
    val banded = Dedup.bandRows(signed, bands, rows, carry = Seq("sig", "__ts"))
    val idx = spark.read.parquet(s"$path/bands")
      .select(col("doc").as("match_doc"), col("band"), col("bh"))
    val cand = banded
      .join(idx, Seq("band", "bh")) // stream-static inner join, stateless
      .filter(col("doc") =!= col("match_doc"))
      .withWatermark("__ts", horizon)
      .dropDuplicatesWithinWatermark("doc", "match_doc")
    val sigs = spark.read.parquet(s"$path/sigs")
      .select(col("doc").as("match_doc"), col("sig").as("__msig"))
    val est = aggregate(
      zip_with(col("sig"), col("__msig"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / lit(k)
    cand.join(sigs, Seq("match_doc")) // stream-static, stateless
      .withColumn("est_jaccard", round(est, 6))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("doc"), col("match_doc"), col("est_jaccard"))
  }
}
