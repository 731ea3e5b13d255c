package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex}
import graft.streaming.StreamingDedupIndex

/** End-to-end: a document stream probed against a batch-built at-rest
  * index flags exactly the cross near-dup pairs (estimated-Jaccard
  * verification), with no corpus re-scan in the streaming plan.
  */
class StreamingDedupIndexSpec extends SparkSpecBase {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("stream finds the planted near-dups of the indexed corpus") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val d = graft.core.Tables(spark, sf("sf0.001")).documents
    val dir = java.nio.file.Files.createTempDirectory("sdix").toString
    DedupIndex.build(d.filter(col("doc_id") < 250), s"$dir/idx")

    // ground truth: exact cross-split pairs at J >= 0.8; the estimator
    // at k=128 sits within ~5 sigma (0.18) of exact J, so with the
    // probe threshold at 0.6 every planted pair (J >= 0.8) must be
    // found, and anything reported must be a true high-J pair
    val exactPairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = exactPairs.filter { case (i, j) => i < 250 && j >= 250 }
    assert(expected.nonEmpty, "testdata should plant cross-split pairs")

    val batchDocs = d.filter(col("doc_id") >= 250)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingDedupIndex.matches(spark, s"$dir/idx",
      input.toDF().toDF("doc_id", "text", "ts"), tsCol = "ts",
      minEstJaccard = 0.6)
    val q = out.writeStream.format("memory")
      .queryName("sdix_matches").outputMode("append").start()
    try {
      input.addData(batchDocs.map { case (id, t) => (id, t, ts(id)) }.toSeq: _*)
      q.processAllAvailable()
      val got = s.table("sdix_matches")
        .select($"match_doc", $"doc").as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      assert(expected.subsetOf(got),
        s"missed planted pairs: ${expected -- got}")
      // no junk: everything flagged at est>=0.6 must be a real pair
      // with exact J >= 0.4 (est overshoot bounded by sampling error)
      val exactLoose = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.4, 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exactLoose), s"false positives: ${got -- exactLoose}")
    } finally q.stop()
  }
}
