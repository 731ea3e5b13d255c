package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpecBase {

  private def emb = graft.core.Tables(spark, sf("sf0.001")).embeddings

  test("int8 bounds every element in [-127,127] with err <= scale/2") {
    val s = spark
    import s.implicits._
    val q = Quantize.int8(emb, "embedding")
      .select($"vec_id", $"scale",
        array_min($"q").as("lo"), array_max($"q").as("hi"),
        array_max(zip_with($"embedding".cast("array<double>"), $"q",
          (x, qq) => abs(x - qq * $"scale"))).as("err"))
      .as[(Long, Double, Int, Int, Double)].collect()
    assert(q.nonEmpty)
    q.foreach { case (id, scale, lo, hi, err) =>
      assert(lo >= -127 && hi <= 127, s"vec $id out of int8 range")
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err > scale/2")
    }
    // unit-ish vectors: at least one element hits the extreme bucket
    assert(q.exists { case (_, _, lo, hi, _) => lo == -127 || hi == 127 })
  }

  test("zero vectors quantize to zeros at scale 0, never divide by it") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.int8Audit(df, "vec_id", "embedding")
      .orderBy($"vec_id")
      .as[(Long, Double, Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 0.0, 3L, 0L, 0L, 0.0)))
    val (_, scale, n, qmin, qmax, err) = out(1)
    assert(n == 3L && qmax == 64L && qmin == -127L)
    // the audit rounds scale to 9 decimals for the hash gate
    assert(math.abs(scale - 2.0 / 127) < 1e-9 && err <= scale / 2 + 1e-9)
  }

  test("dequantized dot products track the float originals") {
    val s = spark
    import s.implicits._
    // int8 exists to feed ANN: reconstruction must preserve geometry
    val q = Quantize.int8(emb.limit(50), "embedding")
      .select($"vec_id", $"scale", $"q",
        $"embedding".cast("array<double>").as("v"))
    val pairs = q.as("a").join(q.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(
        aggregate(zip_with($"a.v", $"b.v", (x, y) => x * y),
          lit(0.0), (acc, e) => acc + e).as("exact"),
        aggregate(zip_with($"a.q", $"b.q", (x, y) => x * y),
          lit(0.0), (acc, e) => acc + e)
          .*($"a.scale" * $"b.scale").as("approx"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    // 64-dim unit vectors: int8 dot error is well under 0.02 absolute
    pairs.foreach { case (e, a) => assert(math.abs(e - a) < 0.02) }
  }

  // ---- product quantization ----

  test("pqCodebooks shapes m x k x (D/m); pqEncode codes in [0, k)") {
    val books = Quantize.pqCodebooks(emb, m = 8, k = 4, maxIter = 3)
    assert(books.size == 8)
    assert(books.forall(_.size == 4))
    assert(books.forall(_.forall(_.size == 8))) // 64/8
    val s = spark
    import s.implicits._
    val codes = Quantize.pqEncode(emb, books)
      .select($"codes").as[Seq[Int]].collect()
    assert(codes.nonEmpty && codes.forall(_.size == 8))
    assert(codes.flatten.forall(c => c >= 0 && c < 4))
  }

  test("ADC is EXACT when every vector is a concatenation of codewords " +
    "(zero quantization error)") {
    // corpus = all m-fold concatenations over a tiny codeword set per
    // subspace; k-means with k = #distinct subvectors recovers the
    // codewords exactly (each cluster collapses to identical points),
    // so codes reconstruct losslessly and the ADC score IS the dot —
    // rank order must equal brute force even before the exact re-rank
    val s = spark
    import s.implicits._
    val words = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.5, 0.5))
    val corpus = (for (a <- words; b <- words) yield a ++ b)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 2)
      .select(($"vec_id" + 100L).as("vec_id"), $"embedding")
    val got = Quantize.pqAdcTopK(df, queries, m = 2, k = 3, topK = 3,
        rerankDepth = 3, maxIter = 10)
      .orderBy($"qid", $"rank")
      .select($"qid", $"rank", $"neighbor_id").as[(Long, Long, Long)]
      .collect().toSeq
    val brute = graft.operators.Similarity
      .bruteForceTopK(df, queries, k = 3)
      .orderBy($"qid", $"rank")
      .select($"qid", $"rank", $"neighbor_id").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == brute)
  }

  test("PqIndex round-trips the codebooks and serves the in-line answer") {
    val dir = java.nio.file.Files.createTempDirectory("pqspec").toString
    val e = emb
    graft.operators.PqIndex.build(e, dir, m = 8, k = 4, maxIter = 3)
    val back = graft.operators.PqIndex.codebooks(spark, dir)
    assert(back.size == 8 && back.forall(_.size == 4) &&
      back.forall(_.forall(_.size == 8)))
    val queries = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val served = graft.operators.PqIndex
      .adcTopK(spark, dir, e, queries, topK = 3, rerankDepth = 16)
      .collect().map(_.toString).sorted.toSeq
    // the in-line form retrains with the same seed-pinned k-means on
    // the same data, so its books — and the served answer — must match
    val inline = Quantize.pqAdcTopK(e, queries, m = 8, k = 4, topK = 3,
        rerankDepth = 16, maxIter = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(served == inline)
  }
}
