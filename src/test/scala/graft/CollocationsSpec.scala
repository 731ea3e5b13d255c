package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkSpecBase {

  private def top(docs: Seq[(String, String)], k: Int,
                  minCount: Long): Seq[(String, String, String, Long, Long)] = {
    val s = spark
    import s.implicits._
    Collocations.pmiTopK(docs.toDF("lang", "text"), k, minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("pmiTopK reproduces the integer lift recurrence by hand") {
    // one doc "a b a b": bigrams (a,b)x2, (b,a)x1; NB=3
    // heads: a→2, b→1; tails: b→2, a→1
    // lift(a,b) = 2*3*1e6 div (2*2) = 1500000
    // lift(b,a) = 1*3*1e6 div (1*1) = 3000000  — rarer pair, higher lift
    val got = top(Seq(("en", "a b a b")), k = 10, minCount = 1)
    assert(got == Seq(
      ("en", "b", "a", 1L, 3000000L),
      ("en", "a", "b", 2L, 1500000L)))
  }

  test("min-support prunes rare pairs; languages score independently") {
    val docs = Seq(
      ("en", "x y x y x y"), // (x,y)x3 (y,x)x2
      ("fr", "x y"))         // (x,y)x1 in fr only
    val got = top(docs, k = 10, minCount = 3)
    // only en (x,y) survives minCount=3: NB=5, c1h(x)=3, c2t(y)=3
    // lift = 3*5*1e6 div 9 = 1666666
    assert(got == Seq(("en", "x", "y", 3L, 1666666L)))
  }

  test("differential vs an in-memory replay on a seeded random corpus") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1 to 60).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      val words = (0 until (3 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
      (lang, words.mkString(" "))
    }
    // replay: bigram/head/tail/total counts and the exact staged
    // integer expression
    val occ = docs.flatMap { case (lang, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      ws.iterator.zip(ws.iterator.drop(1)).map(p => (lang, p._1, p._2)).toSeq
    }
    val big = occ.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val heads = big.groupBy { case ((l, w1, _), _) => (l, w1) }
      .map { case (k, m) => k -> m.values.sum }
    val tails = big.groupBy { case ((l, _, w2), _) => (l, w2) }
      .map { case (k, m) => k -> m.values.sum }
    val tot = big.groupBy { case ((l, _, _), _) => l }
      .map { case (k, m) => k -> m.values.sum }
    val minCount = 2L
    val expected = big.toSeq
      .collect { case ((l, w1, w2), c12) if c12 >= minCount =>
        val lift = c12 * tot(l) * 1000000L / (heads((l, w1)) * tails((l, w2)))
        (l, w1, w2, c12, lift)
      }
      .sortBy { case (l, w1, w2, _, lift) => (-lift, l, w1, w2) }
      .take(25)
    assert(top(docs, k = 25, minCount = minCount) == expected)
  }
}
