package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Differential test for the native `bloom_might_contain` expression:
  * the probe must be bit-identical to the Scala-side
  * `BloomFilter.mightContainString` it replaced (same Murmur3 over the
  * same UTF-8 bytes), including on multi-byte UTF-8, and the foldable
  * contract must reject a per-row filter column at analysis.
  */
class BloomMightContainSpec extends SparkSpecBase {

  test("native probe matches mightContainString bit-for-bit, incl. multi-byte UTF-8") {
    val s = spark
    import s.implicits._
    val members = Seq("alpha", "beta", "γάμμα δέλτα", "naïve café", "東京 大阪")
    val probes = members ++ Seq("missing", "álpha", "γάμμα", "alpha ", "", "東京")
    val df = members.toDF("w")
    val bloom = df.stat.bloomFilter("w", members.size.toLong, 0.03)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val got = probes.toDF("w")
      .select($"w", call_function("bloom_might_contain", lit(bytes), $"w").as("hit"))
      .as[(String, Boolean)].collect().toMap
    for (p <- probes)
      assert(got(p) == bloom.mightContainString(p),
        s"native probe diverged from mightContainString on '$p'")
    // no false negatives, whatever the fpp draws did
    for (m <- members) assert(got(m), s"member '$m' must hit")
  }

  test("a non-literal filter column is rejected at analysis, not probed per row") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", Array[Byte](1, 2, 3))).toDF("w", "f")
    val ex = intercept[Exception] {
      df.select(call_function("bloom_might_contain", $"f", $"w")).collect()
    }
    assert(ex.isInstanceOf[AnalysisException] ||
      ex.getMessage.contains("foldable") || ex.getMessage.contains("literal"),
      s"expected an analysis-time rejection, got: $ex")
  }

  test("null filter literal and null item both yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("x"), None).toDF("w")
    val rows = df.select(
      call_function("bloom_might_contain", lit(null).cast("binary"), $"w").as("h"))
      .collect()
    assert(rows.forall(_.isNullAt(0)), "null filter must propagate null")
  }
}
