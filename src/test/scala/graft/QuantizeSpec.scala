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
}
