package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The per-row `minhash_row` expression must be bit-equal to the batch
  * `minhash_sig` aggregate for the same text — the property that lets
  * a stream probe an index built by a batch job.
  */
class MinHashRowSpec extends SparkSpecBase {

  private def docs = graft.core.Tables(spark, sf("sf0.001")).documents

  test("per-row signature equals the batch aggregate signature") {
    val d = docs
    val batch = Dedup.minhashSignatures(d, "doc_id", "text", n = 3, numHashes = 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val perRow = Dedup.withMinhashSignature(d, "text", "sig", n = 3, numHashes = 128)
      .select(col("doc_id"), col("sig"))
      .collect()
      .flatMap(r => if (r.isNullAt(1)) None
        else Some(r.getLong(0) -> r.getSeq[Long](1).toSeq)).toMap
    assert(batch.nonEmpty)
    assert(perRow == batch)
  }

  test("short docs get a null signature, matching the batch no-row") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "only two"), (2L, "three word doc"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.withMinhashSignature(d, "text", "sig", n = 3, numHashes = 8)
      .select($"doc_id", $"sig".isNull).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))
    val batchDocs = Dedup.minhashSignatures(d, "doc_id", "text", 3, 8)
      .select($"doc").as[Long].collect().toSet
    assert(batchDocs == Set(2L))
  }

  test("signature agreement estimates Jaccard within sampling error") {
    // planted near-dup pairs (exact J >= 0.8): with k=128 hashes the
    // estimator's stderr is ~sqrt(J(1-J)/128) <= 0.036 — assert every
    // planted pair's estimate is within 5 sigma of its exact Jaccard
    val d = docs
    val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    val sigs = Dedup.withMinhashSignature(d, "text", "sig", 3, 128)
      .select(col("doc_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    exact.foreach { case ((i, j), jac) =>
      val est = sigs(i).zip(sigs(j)).count { case (a, b) => a == b } / 128.0
      assert(math.abs(est - jac) < 0.18, s"pair ($i,$j): est $est vs exact $jac")
    }
  }
}
