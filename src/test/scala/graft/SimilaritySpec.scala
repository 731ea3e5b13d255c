package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {

  private def emb = graft.core.Tables(spark, sf("sf0.001")).embeddings

  /** Perturbed copies at cosine ≈0.97, ids offset +1M (mirrors
    * SimilarityQueries.perturbed).
    */
  private def perturbed(e: org.apache.spark.sql.DataFrame) =
    e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => x + lit(0.04) * sin(col("vec_id") * 7 + i)).as("embedding"))

  test("LSH top-k rank-1 recovers the source of each perturbed query") {
    val queries = perturbed(emb.filter(col("vec_id") < 10))
    val top = Similarity.lshTopK(emb, queries, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(top.size == 10)
    top.foreach { case (qid, neighbor) =>
      assert(neighbor == qid - 1000000L, s"query $qid resolved to $neighbor")
    }
  }

  test("LSH cosines agree with brute-force cosines for the same pairs") {
    val queries = perturbed(emb.filter(col("vec_id") < 10))
    val brute = Similarity.bruteForceTopK(emb, queries, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, cos) =>
      brute.get(pair).foreach(b => assert(math.abs(b - cos) < 1e-9))
    }
  }

  test("IVF top-k rank-1 recovers the source of each perturbed query") {
    val queries = perturbed(emb.filter(col("vec_id") < 10))
    val top = Similarity.ivfTopK(emb, queries, k = 1, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(top.size == 10)
    top.foreach { case (qid, neighbor) =>
      assert(neighbor == qid - 1000000L, s"query $qid resolved to $neighbor")
    }
  }

  test("IVF with nprobe == nlist recovers the exact brute-force top-k") {
    val queries = perturbed(emb.filter(col("vec_id") < 5))
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // probing every cell degrades gracefully to the exact scan
    val ivf = Similarity.ivfTopK(emb, queries, k = 3, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("cosine near-dup recovers nearly all planted pairs, no false claims") {
    val e = emb
    val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pairs = Similarity.cosineNearDupPairs(base.union(perturbed(e)), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.count { case (i, j, _) => j - i == 1000000L }
    val n = e.count()
    assert(planted >= (n * 0.9).toInt, s"found $planted of $n planted pairs")
    // every reported cosine clears the threshold (exact-verified)
    assert(pairs.forall(_._3 >= 0.9))
  }

  test("labelCentroids equals the per-dimension mean computed in memory") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0, Seq(1.0f, -2.0f, 0.5f)),
      (0, Seq(3.0f, 4.0f, -0.5f)),
      (1, Seq(10.0f, 0.0f, 2.25f))).toDF("label", "embedding")
    val got = Similarity.labelCentroids(vecs)
      .orderBy(col("label"), col("pos"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(4)))
    // expected: floor(v*1e6) summed exactly, then the explicit
    // half-up floor — the same integral-domain mean, not a float mean
    val expected = Seq(
      (0, Seq(Seq(1.0, -2.0, 0.5), Seq(3.0, 4.0, -0.5))),
      (1, Seq(Seq(10.0, 0.0, 2.25)))).flatMap { case (l, vs) =>
      vs.head.indices.map { d =>
        val sq = vs.map(v => math.floor(v(d) * 1e6).toLong).sum
        (l, d, math.floor(sq.toDouble / vs.size + 0.5).toLong)
      }
    }
    assert(got.toSeq == expected)
  }

  test("semanticDedup keeps the min-id exemplar of each within-cell dup group") {
    val s = spark
    import s.implicits._
    // two well-separated cells; 1/2/3 are near-dups in cell A (min id 1
    // survives), 10 is alone in cell B
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.01f)), (3L, Seq(0.998f, 0.02f)),
      (10L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val kept = Similarity.semanticDedup(vecs, cents, threshold = 0.99, nassign = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 10L -> 1L))
  }

  test("semanticDedup soft assignment catches a cell-boundary dup pair") {
    val s = spark
    import s.implicits._
    // 1 and 2 are a near-dup pair straddling the Voronoi boundary
    // between the two centroids: 1 lands in cell A, 2 in cell B, so
    // hard assignment (nassign=1) never compares them
    val vecs = Seq(
      (1L, Seq(1.0f, 0.99f)), (2L, Seq(0.99f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    def kept(nassign: Int) =
      Similarity.semanticDedup(vecs, cents, threshold = 0.99, nassign = nassign)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept(1) == Map(1L -> 1L, 2L -> 1L),
      "hard assignment should miss the boundary pair (the documented gap)")
    assert(kept(2) == Map(1L -> 1L, 2L -> 0L),
      "nassign=2 must bring the boundary pair into a shared cell")
  }

  test("dot/cosine expressions compute correctly on known vectors") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val row = df.select(
      Similarity.dot(col("a"), col("b")).as("dot"),
      Similarity.cosine(col("a"), col("a")).as("self")).head
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force circuit breaker: a corpus-sized query set trips the " +
    "pair budget BEFORE the scoring join; an in-budget call is unaffected") {
    // misuse mode: queries == corpus → Q·N pairs
    val ex = intercept[IllegalStateException] {
      Similarity.bruteForceTopK(emb, emb, k = 1, pairBudget = 100L)
    }
    assert(ex.getMessage.contains("pairBudget"))
    assert(ex.getMessage.contains("lshTopK"))
    // the same call with a genuinely small query set still runs
    val ok = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 2),
      k = 1, pairBudget = 100000L)
    assert(ok.count() == 2)
  }
}
