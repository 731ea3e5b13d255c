package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

class LanguageModelSpec extends SparkSpecBase {

  private def df(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private def micro(p: Double): Long =
    -math.floor(math.log(p) * 1e6).toLong

  test("bigramNll matches the hand-built add-1 model on a tiny corpus") {
    // corpus (one lang): "a b a" -> (a,b),(b,a); "a c" -> (a,c)
    // V = |{a,b,c}| = 3; heads: a->2, b->1
    // p(b|a) = (1+1)/(2+3), p(a|b) = (1+1)/(1+3), p(c|a) = (1+1)/(2+3)
    val out = LanguageModel.bigramNll(
        df((1L, "en", "a b a"), (2L, "en", "a c")))
      .orderBy(col("doc")).collect()
    val e1 = micro(2.0 / 5) + micro(2.0 / 4)
    val e2 = micro(2.0 / 5)
    assert(out(0).getLong(2) == 2 && out(0).getLong(3) == e1)
    assert(out(0).getLong(4) == e1 / 2)
    assert(out(1).getLong(2) == 1 && out(1).getLong(3) == e2)
  }

  test("documents with fewer than two tokens emit no row") {
    val out = LanguageModel.bigramNll(
      df((1L, "en", "single"), (2L, "en", ""), (3L, "en", "two words")))
    assert(out.select("doc").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("common transitions score lower than unseen-word text") {
    val common = (1 to 8).map(i =>
      (i.toLong, "en", "the cat sat on the mat"))
    val weird = (100L, "en", "zq xv qj wk vn bb")
    val out = LanguageModel.bigramNll(df(common :+ weird: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(1L) < out(100L))
  }

  test("models are trained per language, not globally") {
    // "x y" dominates lang A (p near 1) but is one of many diverse
    // bigrams in lang B — same text, different lang, different score
    val a = (1 to 6).map(i => (i.toLong, "aa", "x y"))
    val b = Seq((10L, "bb", "x y"), (11L, "bb", "p q r s t u v w"))
    val out = LanguageModel.bigramNll(df(a ++ b: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(1L) < out(10L))
  }
}
