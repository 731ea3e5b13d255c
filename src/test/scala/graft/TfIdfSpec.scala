package graft

import org.apache.spark.sql.functions._

import graft.operators.TfIdf

class TfIdfSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("topKeywords ranks by tf*idf with term tie-break; ubiquitous terms score 0") {
    // "filler" is in all 4 docs -> idf = ln(1) = 0 -> score 0.
    // doc 1: "apple" tf=2 df=1; "pear" tf=1 df=2.
    val corpus = df(
      (1L, "filler apple apple pear"),
      (2L, "filler pear"),
      (3L, "filler zebra"),
      (4L, "filler"))
    val out = TfIdf.topKeywords(corpus, k = 2)
      .orderBy(col("doc"), col("rank")).collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1(0).getString(2) == "apple")
    assert(d1(0).getLong(3) == 2 && d1(0).getLong(4) == 1)
    assert(d1(0).getLong(5) == 2 * math.floor(math.log(4.0) * 1e6).toLong)
    assert(d1(1).getString(2) == "pear")
    assert(d1(1).getLong(5) == math.floor(math.log(2.0) * 1e6).toLong)
    // doc 4 has only the ubiquitous term: still ranked, score exactly 0
    val d4 = out.filter(_.getLong(0) == 4L)
    assert(d4.length == 1 && d4(0).getString(2) == "filler" &&
      d4(0).getLong(5) == 0L)
  }

  test("equal scores break ties on the term string ascending") {
    val out = TfIdf.topKeywords(
        df((1L, "beta alpha"), (2L, "gamma")), k = 2)
      .filter(col("doc") === 1).orderBy(col("rank")).collect()
    // alpha and beta both tf=1 df=1 -> identical score; alpha first
    assert(out.map(_.getString(2)).toSeq == Seq("alpha", "beta"))
  }

  test("empty documents emit no rows; k bounds output per doc") {
    val out = TfIdf.topKeywords(
      df((1L, ""), (2L, "a b c d e f")), k = 3)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(1L) && byDoc(2L).length == 3)
  }
}
