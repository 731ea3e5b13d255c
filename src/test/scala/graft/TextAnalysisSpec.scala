package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("sourceDivergence computes exact TV micro-units incl. absent-word mass") {
    val s = spark
    import s.implicits._
    // stratum A = "a a b" (T=3), B = "b c" (T=2); N=5, C=(a:2, b:2, c:1)
    // TV(A) = ½(|2/3−2/5| + |1/3−2/5| + |0−1/5|) = 4/15 → 266666 µ
    // TV(B) = ½(|0−2/5| + |1/2−2/5| + |1/2−1/5|) = 2/5  → 400000 µ
    // (word c is ABSENT from A and a from B — the closed-form fold)
    val rows = TextAnalysis.sourceDivergence(
        Seq(("A", "a a b"), ("B", "b c")).toDF("source", "text"),
        "source", "text")
      .orderBy(col("source")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("A", 3L, 8L, 266666L), ("B", 2L, 8L, 400000L)))
  }

  test("sourceDivergence is zero for identically-distributed strata") {
    val s = spark
    import s.implicits._
    val rows = TextAnalysis.sourceDivergence(
        Seq(("A", "x y"), ("B", "x y"), ("B", "x y")).toDF("source", "text"),
        "source", "text")
      .collect()
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("tokenStats counts whitespace and BPE-ish tokens") {
    val row = TextAnalysis.tokenStats(
      df((1L, "the quick brown fox!! 42 jumps")), "doc_id", "text").head
    assert(row.getLong(1) == 6)       // ws tokens
    assert(row.getLong(2) == 8)       // bpe-ish: 5 words + '!' + '!' + '42'
    assert(row.getLong(3) == 30)      // chars
    assert(row.getLong(4) == 8)       // ceil(30/4)
  }

  test("languageId picks marker argmax, und when nothing matches") {
    val out = TextAnalysis.languageId(
      df((1L, "the cat and the hat"), (2L, "der hund und die katze"),
        (3L, "zzz qqq")), "doc_id", "text")
      .orderBy(col("doc")).collect()
    assert(out(0).getString(1) == "en" && out(0).getLong(2) == 3)
    assert(out(1).getString(1) == "de" && out(1).getLong(2) == 3)
    assert(out(2).getString(1) == "und" && out(2).getLong(2) == 0)
  }

  test("rolling fingerprint is the Karp-Rabin fold; md5 matches reference value") {
    val row = TextAnalysis.fingerprints(df((1L, "ab")), "doc_id", "text").head
    assert(row.getString(1) == "187ef4436122d1cc2f40dc2b92f0eba0") // md5("ab")
    assert(row.getLong(2) == 97L * 31 + 98)
  }

  test("quality score stays in [0,1] and rewards stopword-rich long text") {
    val out = TextAnalysis.qualityScore(
      df((1L, ("the a of and to " * 20).trim), (2L, "zq")), "doc_id", "text")
      .orderBy(col("doc")).collect()
    val good = out(0).getDouble(5); val bad = out(1).getDouble(5)
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
  }

  test("repetitionStats: hand-computed ratios, short docs emit zeros") {
    val out = TextAnalysis.repetitionStats(
      df((1L, "a a a a"),       // grams: 3x "a a" -> dup 2/3, top 1
        (2L, "a b c"),          // grams: "a b","b c" -> dup 0, top 1/2
        (3L, "x"),              // no grams
        (4L, "")),              // no tokens at all
      "doc_id", "text").orderBy(col("doc")).collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 4 && r1.getDouble(2) == 0.75) // 1 - 1/4
    assert(r1.getLong(3) == 3)
    assert(r1.getDouble(4) == 0.666667 && r1.getDouble(5) == 1.0)
    val r2 = out(1)
    assert(r2.getLong(1) == 3 && r2.getDouble(2) == 0.0)
    assert(r2.getLong(3) == 2)
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.5)
    for (i <- Seq(2, 3)) {
      assert(out(i).getLong(3) == 0L)
      assert(out(i).getDouble(4) == 0.0 && out(i).getDouble(5) == 0.0)
      assert(!out(i).anyNull)
    }
  }

  test("redactPii replaces emails/phones/IPs with placeholders and counts them") {
    val out = TextAnalysis.redactPii(
      df((1L, "mail bob@example.com and alice@web.co today"),
        (2L, "call 555-123-4567 or 555.987.6543"),
        (3L, "hosts 10.0.0.1 and 192.168.1.254"),
        (4L, "mixed a@b.io 1.2.3.4 777-888-9999"),
        (5L, "nothing sensitive here 12345"),
        (6L, "call 555-123-4567@corp.example now")),
      "doc_id", "text").orderBy(col("doc")).collect()
    assert(out(0).getLong(1) == 2 &&
      out(0).getString(4) == "mail <EMAIL> and <EMAIL> today")
    assert(out(1).getLong(2) == 2 &&
      out(1).getString(4) == "call <PHONE> or <PHONE>")
    assert(out(2).getLong(3) == 2 &&
      out(2).getString(4) == "hosts <IP> and <IP>")
    assert(out(3).getLong(1) == 1 && out(3).getLong(2) == 1 &&
      out(3).getLong(3) == 1 &&
      out(3).getString(4) == "mixed <EMAIL> <IP> <PHONE>")
    assert(out(4).getLong(1) == 0 && out(4).getLong(2) == 0 &&
      out(4).getLong(3) == 0 &&
      out(4).getString(4) == "nothing sensitive here 12345")
    // the email pass consumes the whole token, so no phone is counted:
    // every count reconciles with the placeholders actually inserted
    assert(out(5).getLong(1) == 1 && out(5).getLong(2) == 0 &&
      out(5).getString(4) == "call <EMAIL> now")
  }

  test("normalizeMarkup strips tags, decodes entities once, collapses space") {
    val out = TextAnalysis.normalizeMarkup(df(
        (1L, "<p>Hello <b>world</b></p>"),
        (2L, "a &amp;amp; b &lt;x&gt; c"), // double-encoded amp: ONE decode
        (3L, "  runs\t\tof\n\nspace  "),
        (4L, "&nbsp;pad&nbsp;"),
        (5L, "plain text untouched"),
        (6L, "")), "doc_id", "text")
      .orderBy(col("doc")).collect()
    assert(out(0).getLong(1) == 4 && out(0).getString(2) == "Hello world")
    // &amp;amp; -> &amp; (literal), &lt;x&gt; -> <x> (not re-stripped:
    // tags were removed BEFORE entity decode)
    assert(out(1).getLong(1) == 0 && out(1).getString(2) == "a &amp; b <x> c")
    assert(out(2).getString(2) == "runs of space")
    assert(out(3).getString(2) == "pad")
    assert(out(4).getString(2) == "plain text untouched")
    assert(out(5).getString(2) == "" && out(5).getLong(3) == 0L)
    assert(out.forall(r => r.getLong(3) == r.getString(2).length.toLong))
  }

  test("encodingStats counts non-ascii/control/replacement; ppm floors") {
    val out = TextAnalysis.encodingStats(df(
        (1L, "café"),              // 1 non-ascii of 4 chars -> 250000 ppm
        (2L, "a\u0001b\u001Fc\t"), // 2 control (tab is NOT control here)
        (3L, "x�y"),
        (4L, "")), "doc_id", "text")
      .orderBy(col("doc")).collect()
    assert(out(0).getLong(2) == 1 && out(0).getLong(5) == 250000L)
    assert(out(1).getLong(3) == 2 && out(1).getLong(2) == 0)
    assert(out(2).getLong(4) == 1)
    assert(out(3).getLong(1) == 0 && out(3).getLong(5) == 0L)
  }

  test("empty and whitespace-only docs score 0, never null or an error") {
    // guarded divisions: an unguarded /0 would throw on ANSI sessions
    // and null-drop otherwise — poison for a long-running stream
    val out = TextAnalysis.qualityScore(
      df((1L, ""), (2L, "   "), (3L, "a real doc here")), "doc_id", "text")
      .orderBy(col("doc")).collect()
    Seq(0, 1).foreach { i =>
      assert(!out(i).isNullAt(5) && out(i).getDouble(5) == 0.0)
      assert(out(i).getLong(1) == 0L) // n_tokens
    }
    assert(out(2).getDouble(5) > 0.0)
  }

  test("vocabCoverage ranks by count desc then token, k-limits, exact ppm shares") {
    // corpus: a×5, b×3, c×3, d×1 → total 12; k=3 drops d
    val corpus = df(
      (1L, "a a a b c"), (2L, "a b  c"), (3L, "a b c d"))
    val got = TextAnalysis.vocabCoverage(corpus, "text", k = 3)
      .orderBy(col("rank"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // integral ppm: cum*1e6 div total — exact long division, no floats
    assert(got.toSeq == Seq(
      (1L, "a", 5L, 5L * 1000000 / 12),
      (2L, "b", 3L, 8L * 1000000 / 12),
      (3L, "c", 3L, 11L * 1000000 / 12)))
  }

  test("readability: hand-computed Flesch integers, sentence floor, " +
    "wordless zero row, negative scores are data") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.readability(
        df((1L, "The cat sat. It ran!"), (2L, ""), (3L, "zzz zzz"),
          (4L, "banana banana")),
        "doc_id", "text")
      .orderBy($"doc").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // W=5 Se=2 Sy=4: 206835000 − 1015000·5 div 2 − 84600000·4 div 5
      (1L, 5L, 2L, 4L, 206835000L - 2537500L - 67680000L),
      // wordless: explicit zero row, not a null or a division crash
      (2L, 0L, 0L, 0L, 0L),
      // no sentence marks and no vowels: the max(Se,1) floor fires
      (3L, 2L, 0L, 0L, 206835000L - 2030000L),
      // 3 vowel runs per 'banana': Sy/W = 3 drives the score negative
      (4L, 2L, 0L, 6L, 206835000L - 2030000L - 253800000L)))
    assert(got(3)._5 < 0L)
  }

  test("vocabGrowth: debuts in id order, explicit zero rows, cumulative curve") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.vocabGrowth(
        df((1L, "a b b"), (2L, "b c"), (3L, ""), (4L, "c a d")),
        "doc_id", "text")
      .orderBy($"doc").as[(Long, Long, Long)].collect().toSeq
    // doc 1 debuts {a,b}; doc 2 debuts {c}; doc 3 is empty (explicit 0);
    // doc 4 re-sees c and a, debuts only {d}
    assert(got == Seq((1L, 2L, 2L), (2L, 1L, 3L), (3L, 0L, 3L), (4L, 1L, 4L)))
  }

  test("vocabGrowth: monotone curve ending at the distinct-word count " +
    "on a seeded corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2032)
    val docs = (1L to 80L).map { i =>
      (i, (1 to rnd.nextInt(12)).map(_ => s"w${rnd.nextInt(60)}").mkString(" "))
    }
    val got = TextAnalysis.vocabGrowth(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy($"doc").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == docs.map(_._1)) // one row per doc, id order
    // the curve is the running sum of debuts and ends at |vocabulary|
    got.foldLeft(0L) { case (acc, (_, nNew, size)) =>
      assert(size == acc + nNew); size
    }
    val vocab = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty).distinct
    assert(got.last._3 == vocab.size.toLong)
    // and the per-doc debuts match the sequential first-seen fold
    val seen = scala.collection.mutable.Set[String]()
    val ref = docs.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).distinct
        .filterNot(seen)
      seen ++= ws
      (id, ws.size.toLong)
    }
    assert(got.map(g => (g._1, g._2)) == ref)
  }
}
