package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** The native simhash_fp aggregate vs the 64-sum-column formulation it
  * replaced, and vs the streaming per-row fold — all bit-equal.
  */
class SimHashFpSpec extends SparkSpecBase {

  private def docs = graft.core.Tables(spark, sf("sf0.001")).documents.limit(150)

  test("simhash_fp equals the 64-sum-column formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val tok = docs.select($"doc_id".as("doc"),
        explode(filter(split($"text", "\\s+"), w => w =!= "")).as("w"))
      .withColumn("h", xxhash64($"w"))
    val native = tok.groupBy($"doc")
      .agg(call_function("simhash_fp", $"h").as("fp"))
      .as[(Long, Long)].collect().toMap
    val votes = (0 until 64).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val fpExpr = (0 until 64).map { i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val columns = tok.groupBy($"doc").agg(votes.head, votes.tail: _*)
      .select($"doc", fpExpr.as("fp")).as[(Long, Long)].collect().toMap
    assert(native.nonEmpty && native == columns)
  }

  test("batch fingerprint equals the streaming per-row fold and is " +
    "partitioning-independent") {
    val s = spark
    import s.implicits._
    val batch = Dedup.simhashFingerprints(docs.repartition(16), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val streaming = StreamingDedup.withSimhash(docs, "text")
      .select($"doc_id", $"fp").as[(Long, Long)].collect().toMap
    assert(batch.nonEmpty && batch == streaming)
  }
}
