package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunk geometry: starts, lengths, overlap, short last chunk") {
    val words = (1 to 57).map(i => s"w$i")
    val out = Chunking.chunkDocs(df((1L, words.mkString(" "))),
        chunkTokens = 32, stride = 24)
      .orderBy(col("chunk_id")).collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 32L), (25L, 32L), (49L, 9L)))
    // overlap: chunk 1 starts 8 tokens before chunk 0 ends
    assert(out(1).getString(4).startsWith("w25 w26"))
    assert(out(0).getString(4).endsWith("w31 w32"))
    assert(out(2).getString(4) == (49 to 57).map("w" + _).mkString(" "))
  }

  test("every token position is covered and fresh text never repeats within a doc") {
    val words = (1 to 100).map(i => s"t$i")
    val out = Chunking.chunkDocs(df((1L, words.mkString(" "))),
        chunkTokens = 32, stride = 24).collect()
    val covered = out.flatMap(r =>
      r.getLong(2) to (r.getLong(2) + r.getLong(3) - 1)).toSet
    assert(covered == (1L to 100L).toSet)
  }

  test("boundary cases: doc exactly chunk-sized -> 1 chunk; empty doc -> none") {
    val out = Chunking.chunkDocs(
      df((1L, (1 to 32).map("x" + _).mkString(" ")), (2L, ""),
        (3L, "solo")),
      chunkTokens = 32, stride = 24).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(3) == 32)
    assert(!byDoc.contains(2L))
    assert(byDoc(3L).length == 1 && byDoc(3L).head.getString(4) == "solo")
  }
}
