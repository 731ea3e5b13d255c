package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The native minhash_sig imperative aggregate vs the 128-column
  * min((h·a+b) mod p) formulation it replaced — must be bit-equal.
  */
class MinHashSigSpec extends SparkSpecBase {

  private val P = 2147483647L

  test("minhash_sig equals the per-column min formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val numHashes = 32
    val rows = (0 until 1000).map(i => (i % 7L, (i * 2654435761L) % P))
    val df = rows.toDF("doc", "h")
    val native = df.groupBy($"doc")
      .agg(call_function("minhash_sig", $"h", lit(numHashes)).as("sig"))
      .select($"doc", $"sig").as[(Long, Seq[Long])].collect().toMap
    val mins = Dedup.minhashParams(numHashes).zipWithIndex.map {
      case ((a, b), i) => min(($"h" * a + b) % P).as(s"m$i")
    }
    val columns = df.groupBy($"doc").agg(mins.head, mins.tail: _*)
      .select($"doc", array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.nonEmpty && native == columns)
  }

  test("signatures are deterministic across repartitionings (merge path)") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables(s, sf("sf0.001")).documents.limit(100)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(df, "doc_id", "text", 3, 64)
        .select($"doc", $"sig").as[(Long, Seq[Long])].collect().toMap
    val one = sigs(docs.coalesce(1))     // single partition: no merge
    val many = sigs(docs.repartition(16)) // partial buffers must merge
    assert(one.nonEmpty && one == many)
  }

  test("a doc with fewer words than n yields no signature row") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "only two"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.minhashSignatures(df, "doc_id", "text", 3, 8)
      .select($"doc").as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
