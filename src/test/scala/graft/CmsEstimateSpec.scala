package graft

import org.apache.spark.sql.functions._

/** cms_estimate (native probe) against Spark's count_min_sketch
  * aggregate: the CMS invariants, merge determinism, and null
  * semantics.
  */
class CmsEstimateSpec extends SparkSpecBase {

  // 2000 rows over 500 distinct tokens with a skewed head; a COARSE
  // sketch (eps=0.01 → width 200 < vocab) forces real collisions so
  // the one-sided error invariant is actually exercised.
  private def corpus = {
    val s = spark
    import s.implicits._
    (1 to 2000).map { i =>
      if (i % 4 == 0) "hot" else s"tok${i % 500}"
    }.toDF("w")
  }

  private def estimates(numParts: Int): Map[String, Long] = {
    val s = spark
    import s.implicits._
    val df = corpus.repartition(numParts)
    val sk = df.agg(expr("count_min_sketch(w, 0.01d, 0.999d, 42)").as("sk"))
    val exact = df.groupBy($"w").agg(count(lit(1)).as("cnt"))
    exact.crossJoin(broadcast(sk))
      .select($"w", call_function("cms_estimate", $"sk", $"w").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and overcount stays within eps*N") {
    val s = spark
    import s.implicits._
    val exact = corpus.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(4)
    assert(est.keySet == exact.keySet)
    // one-sided error: est >= true ALWAYS (counters only ever add)
    exact.foreach { case (w, cnt) =>
      assert(est(w) >= cnt, s"$w undercounted: ${est(w)} < $cnt")
    }
    // eps*N bound holds with prob >= 1-delta per item; allow a few
    // unlucky items but not a broken sketch
    val n = 2000L
    val bound = math.ceil(0.01 * n).toLong
    val over = exact.count { case (w, cnt) => est(w) > cnt + bound }
    assert(over <= exact.size / 20, s"$over of ${exact.size} exceed eps*N")
  }

  test("sketch merge is deterministic: estimates identical across partitionings") {
    assert(estimates(1) == estimates(7))
  }

  test("null sketch or null item returns null; absent items estimate >= 0") {
    val s = spark
    import s.implicits._
    val sk = corpus.agg(expr("count_min_sketch(w, 0.01d, 0.999d, 42)").as("sk"))
    val row = sk.select(
      call_function("cms_estimate", $"sk", lit(null).cast("string")).as("a"),
      call_function("cms_estimate", lit(null).cast("binary"), lit("x")).as("b"),
      call_function("cms_estimate", $"sk", lit("never_seen_token")).as("c")).head
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getLong(2) >= 0L)
  }
}
