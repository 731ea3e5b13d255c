package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Differential tests for the native fused `lsh_sig` expression against
  * the composed transform+when-chain form it replaced, plus null/shape
  * semantics. Bucket equality here is what lets s2/s3 keep their
  * seed-pinned oracles across the native rewrite.
  */
class LshSigSpec extends SparkSpecBase {

  private def emb = graft.core.Tables(spark, sf("sf0.001")).embeddings

  test("native lshBuckets equals the composed form bucket-for-bucket") {
    for ((tables, bits) <- Seq((4, 8), (8, 12))) {
      val native = Similarity.lshBuckets(emb, dim = 64, tables, bits)
        .select("id", "tbl", "bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val composed = Similarity.lshBucketsComposed(emb, dim = 64, tables, bits)
        .select("id", "tbl", "bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(native.nonEmpty && native.size == composed.size)
      assert(native == composed, s"bucket mismatch at tables=$tables bits=$bits")
    }
  }

  test("big configs stay codegen'd: 24x14 runs without janino fallback") {
    // The composed form at 24x14 trips janino's 64KB method limit and
    // drops the stage to interpreted eval; the native expression's
    // generated code is constant-size. Assert the signature is sane and
    // deterministic across two evaluations.
    val a = Similarity.lshBuckets(emb.limit(50), dim = 64, tables = 24, bits = 14)
      .select("id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val b = Similarity.lshBuckets(emb.limit(50), dim = 64, tables = 24, bits = 14)
      .select("id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(a.size == 50 * 24)
    assert(a == b)
    assert(a.forall { case (_, t, bk) =>
      t >= 0 && t < 24 && bk >= 0 && bk < (1L << 14)
    })
  }

  test("null vector, null element, and wrong dim all yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), Some(-2.0), Some(0.5)))),
      (2L, None),
      (3L, Some(Seq[Option[Double]](Some(1.0), None, Some(0.5)))),
      (4L, Some(Seq[Option[Double]](Some(1.0), Some(2.0))))) // dim 2 != 3
      .toDF("id", "v")
    val got = df
      .select($"id", call_function("lsh_sig", $"v", lit(3), lit(2), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }
}
