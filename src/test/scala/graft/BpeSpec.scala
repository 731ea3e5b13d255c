package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {

  private def merges(texts: Seq[String], n: Int): Seq[(Long, String, Long)] = {
    val s = spark
    import s.implicits._
    Bpe.learnMerges(texts.toDF("text"), "text", n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
  }

  test("classic corpus: hand-computed merge sequence with lexicographic ties") {
    // words: low:4 lower:1 lowest:1 newer:2 wider:1
    // iter1: "l o" and "o w" both 6 — tie breaks to "l o"
    // iter2: "lo w" 6
    // iter3: "e r" 4 (lower + newer*2 + wider)
    val got = merges(Seq("low low low low lower", "lowest newer newer wider"), 3)
    assert(got == Seq((1L, "l o", 6L), (2L, "lo w", 6L), (3L, "e r", 4L)))
  }

  test("symbol runs: the literal replace consumes the shared delimiter") {
    // " a a a a " merges ONE "a a" per scan (the space between pairs
    // is consumed), so: " aa a a " -> " aa aa " -> " aaaa " — the
    // contract both engines share, asserted so it never drifts
    val got = merges(Seq("aaaa"), 3)
    assert(got == Seq((1L, "a a", 3L), (2L, "a a", 1L), (3L, "aa aa", 1L)))
  }

  test("regex metacharacters in symbols merge literally") {
    // '.' and '+' must be quoted in the replace pattern or the merge
    // corrupts unrelated words
    val got = merges(Seq("a.b a.b a+b xyb"), 2)
    assert(got.head._2 == ". b" || got.head._2 == "a .") // freq-2 pair from a.b
    assert(got.size == 2)
  }

  test("fewer distinct pairs than requested merges ends early, not in error") {
    val got = merges(Seq("ab ab"), 10)
    assert(got.size >= 1 && got.size < 10)
  }

  test("a runaway nMerges fails fast, before any Spark job is scheduled") {
    // each merge is a sequential job + driver round-trip; the cap turns
    // a 50k-vocabulary request from hours of scheduling into an
    // immediate, explanatory failure
    val err = intercept[IllegalArgumentException](merges(Seq("ab"), 50000))
    assert(err.getMessage.contains("MaxMerges"))
    assert(Bpe.MaxMerges >= 100) // t14 and real small vocabularies stay legal
  }

  private def batched(texts: Seq[String], n: Int,
                      batch: Int): Seq[(Int, String, Long, Int)] = {
    val s = spark
    import s.implicits._
    Bpe.learnMergeBatchList(texts.toDF("text"), "text", n, batch)
  }

  test("batched learning with batchSize=1 is EXACTLY the sequential loop") {
    val rnd = new scala.util.Random(77)
    def word() = (0 until 2 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val texts = (1 to 40).map(_ => Seq.fill(4)(word()).mkString(" "))
    val s = spark
    import s.implicits._
    val seq = Bpe.learnMergeList(texts.toDF("text"), "text", 10)
    val bat = batched(texts, 10, batch = 1)
    assert(bat.map(t => (t._1, t._2, t._3)) == seq)
    // each batch-1 round learns exactly one merge
    assert(bat.map(_._4) == (1 to bat.size))
  }

  test("batched rounds pick symbol-disjoint merges in rank order, with " +
    "round-exact frequencies, in ~nMerges/batch rounds") {
    val rnd = new scala.util.Random(99)
    def word() = (0 until 2 + rnd.nextInt(7))
      .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val texts = (1 to 60).map(_ => Seq.fill(5)(word()).mkString(" "))
    val got = batched(texts, 12, batch = 4)
    assert(got.size == 12)
    assert(got.map(_._1) == (1 to 12)) // global iter is dense
    // within a round: pairwise symbol-disjoint, including fused strings
    got.groupBy(_._4).foreach { case (round, picks) =>
      // per-pick symbol sets (a self-pair "b b" contributes {b, bb})
      // must be pairwise disjoint ACROSS picks
      val sets = picks.map { case (_, p, _, _) =>
        val Array(a, b) = p.split(" ", 2); Set(a, b, a + b)
      }
      assert(sets.flatten.distinct.size == sets.map(_.size).sum,
        s"round $round picks share symbols: $picks")
      // rank order within the round: freq non-increasing
      assert(picks.map(_._3) == picks.map(_._3).sortBy(-_), s"round $round")
    }
    // sub-linear rounds: 12 merges at batch 4 needs far fewer than 12
    val rounds = got.map(_._4).max
    assert(rounds <= 6, s"expected <=6 rounds, got $rounds")
    // frequency exactness: each pick's recorded freq equals a from-
    // scratch recount on the corpus with all STRICTLY EARLIER merges
    // applied (disjointness makes same-round earlier picks no-ops on
    // this pair's count)
    def recount(applied: Seq[String], pair: String): Long = {
      val wordFreq = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      wordFreq.map { case (w, f) =>
        var repr = " " + w.toCharArray.map(_.toString).mkString(" ") + " "
        applied.foreach { p =>
          repr = repr.replace(s" $p ", s" ${p.replace(" ", "")} ")
        }
        // non-overlapping scan replicated by replace's left-to-right rule
        val toks = repr.trim.split(" ")
        f * (0 until toks.size - 1)
          .count(k => s"${toks(k)} ${toks(k + 1)}" == pair)
      }.sum
    }
    got.foreach { case (iter, pair, freq, _) =>
      val earlier = got.filter(_._1 < iter).map(_._2)
      assert(recount(earlier, pair) == freq, s"iter=$iter pair=$pair")
    }
  }

  private def encoded(texts: Seq[String],
                      ms: Seq[String]): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.encode(df, "text", "doc_id", ms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("encode: hand-computed token counts under a fixed merge list") {
    // merges: "l o" then "lo w" — "low" → [low] (1 token),
    // "lower" → [low, e, r] (3), "slow" → [s, low] (2: mid-word merge),
    // "xyz" untouched → 3 chars
    val ms = Seq("l o", "lo w")
    val got = encoded(Seq("low lower", "slow xyz"), ms)
    assert(got == Map(0L -> (2L, 4L), 1L -> (2L, 5L)))
  }

  test("encode: zero merges counts characters; merges only ever shrink") {
    val texts = Seq("aa bb", "abc")
    val none = encoded(texts, Nil)
    assert(none == Map(0L -> (2L, 4L), 1L -> (1L, 3L)))
    val some = encoded(texts, Seq("a a", "b b"))
    assert(some == Map(0L -> (2L, 2L), 1L -> (1L, 3L)))
  }

  test("encode: open vocabulary, empty docs explicit, merge order matters") {
    // "a b" fuses only if applied before "ab c" exists — order check:
    // with merges ["a b", "ab c"], "abc" → [abc]; reversed, "ab c"
    // never matches the unfused " a b c " and "a b" then gives [ab, c]
    assert(encoded(Seq("abc"), Seq("a b", "ab c")) == Map(0L -> (1L, 1L)))
    assert(encoded(Seq("abc"), Seq("ab c", "a b")) == Map(0L -> (1L, 2L)))
    // whitespace-only doc → explicit zero row
    assert(encoded(Seq("   "), Seq("a b")) == Map(0L -> (0L, 0L)))
  }

  test("MaxMerges cap end-to-end: batched learning reaches 2000 merges " +
    "and encode folds the full 2000-merge chain — plan built and " +
    "executed in seconds, token counts matching an in-memory replay") {
    val s = spark
    import s.implicits._
    // 600 distinct 12-char words over a 26-letter alphabet: sharing
    // past 2-3 chars is rare, so the merge forest holds well over 2000
    // distinct rules before any word fully fuses
    val rnd = new scala.util.Random(20241)
    val words = Seq.fill(600)(
      (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .distinct
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) =>
        (i.toLong, (ws ++ ws ++ ws).mkString(" ")) // freq 3 per word
      }.toSeq.toDF("doc_id", "text")
    val ms = Bpe.learnMergeBatchList(docs, "text", nMerges = Bpe.MaxMerges,
      batchSize = 64).map(_._2)
    assert(ms.size == Bpe.MaxMerges,
      s"corpus must saturate the cap, learned only ${ms.size}")
    assert(ms.distinct.size == ms.size, "merge rules must be distinct")
    // encode at the cap: 2000 literal replaces folded over the
    // distinct-word relation — the deepest expression the operator's
    // own cost contract permits. The wall bound is deliberately loose
    // (CI noise) but catches the failure modes that matter: analyzer
    // stack overflow, pathological plan rendering, codegen collapse.
    val unseen = "zzzyyyxxxwww zqzqzqzqzqzq"
    val encDocs = (words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq :+
      (999L, unseen)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Bpe.encode(encDocs, "text", "doc_id", ms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val encodeSec = (System.nanoTime() - t0) / 1e9
    assert(encodeSec < 60.0,
      f"2000-merge encode took $encodeSec%.1f s — plan build/exec blew up")
    // in-memory replay of the exact merge semantics (literal
    // left-to-right non-overlapping replace on the padded repr — the
    // String.replace scan rule regexp_replace shares)
    def refTokens(word: String): Int = {
      var repr = " " + word.map(c => s"$c ").mkString
      for (m <- ms) {
        val fused = m.replace(" ", "")
        repr = repr.replace(s" $m ", s" $fused ")
      }
      repr.trim.split(" ").length
    }
    words.grouped(40).zipWithIndex.foreach { case (ws, i) =>
      val expect = (ws.size.toLong, ws.map(refTokens(_).toLong).sum)
      assert(got(i.toLong) == expect, s"doc $i")
    }
    assert(got(999L) ==
      (2L, unseen.split(" ").map(refTokens(_).toLong).sum))
  }

  test("encode: learned merges reproduce the trainer's own segmentation") {
    val s = spark
    import s.implicits._
    val texts = Seq("low low low low lower", "lowest newer newer wider")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ms = Bpe.learnMergeList(df, "text", 3).map(_._2)
    assert(ms == Seq("l o", "lo w", "e r"))
    // after [l o][lo w][e r]: low→[low]=1, lower→[low,er]=2,
    // lowest→[low,e,s,t]=4, newer→[n,e,w,er]=4 (×2 occurrences),
    // wider→[w,i,d,er]=4
    val got = encoded(texts, ms)
    assert(got == Map(0L -> (5L, 1L * 4 + 2L), 1L -> (4L, 4L + 4L + 4L + 4L)))
  }
}
