package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DupCoverageSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val shared = "a b c d e f g h" // one 8-gram

  test("dupNgramCoverage counts cross-doc grams and unions their spans") {
    val out = Dedup.dupNgramCoverage(df(
        (1L, shared + " tail1 tail2"), // dup gram at pos 1 -> covers 1..8
        (2L, "pre " + shared),         // dup gram at pos 2 -> covers 2..9
        (3L, "too short")),            // < 8 tokens: all zeros
      n = 8)
      .orderBy(col("doc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 10L, 1L, 8L)))
    assert(out(1) == ((2L, 9L, 1L, 8L)))
    assert(out(2) == ((3L, 2L, 0L, 0L)))
  }

  test("overlapping duplicated grams cover the union, not the sum") {
    // doc 10 contains the shared gram twice (pos 1 and 9): both
    // occurrences are cross-doc duplicated, spans 1..8 and 9..16
    // union to the full 16 tokens
    val out = Dedup.dupNgramCoverage(df(
        (10L, shared + " " + shared),
        (11L, shared + " z1 z2 z3")), n = 8)
      .orderBy(col("doc")).collect()
    assert(out(0).getLong(2) == 2 && out(0).getLong(3) == 16)
    assert(out(0).getLong(1) == 16)
  }

  test("a gram repeated only within one doc is not duplicated") {
    val out = Dedup.dupNgramCoverage(df(
        (1L, shared + " " + shared),     // within-doc repeat only
        (2L, "q r s t u v w x y z")),    // disjoint vocabulary
      n = 8)
      .orderBy(col("doc")).collect()
    assert(out.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0))
  }
}
