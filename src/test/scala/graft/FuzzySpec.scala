package graft

import org.apache.spark.sql.functions._

import graft.operators.Fuzzy

class FuzzySpec extends SparkSpecBase {

  private def bruteForce(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                         k: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (li, lsv) <- ls; (ri, rsv) <- rs
      dist = lev(lsv, rsv) if dist <= k
    } yield (li, ri, dist.toLong)).toSet
  }

  private def run(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                  k: Int, q: Int = 2): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Fuzzy.Unblocked.editDistanceJoin(ls.toDF("id", "s"), rs.toDF("id", "s"),
        "id", "id", "s", "s", maxDist = k, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  /** Blocked run: block key = first character of the string. */
  private def runBlocked(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                         k: Int, q: Int = 2): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    def withBlk(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("blk", substring(col("s"), 1, 1))
    Fuzzy.editDistanceJoin(withBlk(ls.toDF("id", "s")),
        withBlk(rs.toDF("id", "s")),
        "id", "id", "s", "s", "blk", "blk", maxDist = k, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("duplicate left ids: each STRING keeps its own prefix budget — " +
    "a per-id budget would starve one string's prefix and lose pairs") {
    // two left rows share id 1 with unrelated strings; both must match
    // their own target (pre-fix, the merged q·k+1 budget ranked both
    // strings' grams together and one string could keep zero elements)
    val ls = Seq(1L -> "abcdefgh", 1L -> "uvwxyzqr")
    val rs = Seq(10L -> "abcdefgX", 11L -> "uvwxyzqX")
    assert(run(ls, rs, k = 1) == bruteForce(ls, rs, 1))
    assert(run(ls, rs, k = 1).map(_._2) == Set(10L, 11L))
  }

  test("hand cases: subs, inserts, deletes, exact, over-threshold") {
    val ls = Seq(1L -> "kitten", 2L -> "flaw", 3L -> "identical")
    val rs = Seq(10L -> "sitten", 11L -> "lawn", 12L -> "identical",
      13L -> "completely-different")
    assert(run(ls, rs, 2) == bruteForce(ls, rs, 2))
  }

  test("short strings with ZERO shared grams still pair via the length band") {
    // ed("ab","cd") = 2 with no common q-grams even padded — only the
    // short-string fallback can see this pair
    val ls = Seq(1L -> "ab", 2L -> "x")
    val rs = Seq(10L -> "cd", 11L -> "xy", 12L -> "wholly-unrelated")
    val got = run(ls, rs, 2)
    assert(got == bruteForce(ls, rs, 2))
    assert(got.contains((1L, 10L, 2L)))
  }

  test("repeated grams: multiset ordinals keep the prefix filter lossless") {
    val ls = Seq(1L -> "aaaaaa", 2L -> "ababab")
    val rs = Seq(10L -> "aaaaab", 11L -> "ababab", 12L -> "bababa")
    assert(run(ls, rs, 2) == bruteForce(ls, rs, 2))
  }

  test("differential vs brute force on a seeded random corpus") {
    val rnd = new scala.util.Random(4242)
    def word() = (0 until 3 + rnd.nextInt(8))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // small alphabet → many near-pairs
    val ls = (1L to 60L).map(i => i -> word())
    val rs = (101L to 160L).map(i => i -> word())
    for (k <- Seq(0, 1, 2); q <- Seq(2, 3))
      assert(run(ls, rs, k, q) == bruteForce(ls, rs, k),
        s"mismatch at k=$k q=$q")
  }

  test("maxDist=0 degenerates to exact string equality") {
    val ls = Seq(1L -> "same", 2L -> "other")
    val rs = Seq(10L -> "same", 11L -> "same", 12L -> "diff")
    assert(run(ls, rs, 0) ==
      Set((1L, 10L, 0L), (1L, 11L, 0L)))
  }

  test("blocked join equals brute force restricted to same-block pairs, " +
    "including the short-string fallback within a block") {
    val rnd = new scala.util.Random(515)
    def word() = (0 until 1 + rnd.nextInt(9))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString // len 1..9: shorts too
    val ls = (1L to 60L).map(i => i -> word())
    val rs = (101L to 160L).map(i => i -> word())
    def bruteBlocked(k: Int) = bruteForce(ls, rs, k)
      .filter { case (li, ri, _) =>
        val lsv = ls.find(_._1 == li).get._2
        val rsv = rs.find(_._1 == ri).get._2
        lsv.take(1) == rsv.take(1)
      }
    for (k <- Seq(1, 2); q <- Seq(2, 3)) {
      assert(runBlocked(ls, rs, k, q) == bruteBlocked(k),
        s"mismatch at k=$k q=$q")
      // the fixture must exercise both exclusion and matching or the
      // differential is vacuous
      assert(bruteBlocked(k) != bruteForce(ls, rs, k))
      assert(bruteBlocked(k).nonEmpty)
    }
  }

  test("blocked join never emits a cross-block pair even at distance 0") {
    val ls = Seq(1L -> "same")
    val rs = Seq(10L -> "same")
    val s = spark
    import s.implicits._
    val got = Fuzzy.editDistanceJoin(
        ls.toDF("id", "s").withColumn("blk", lit("A")),
        rs.toDF("id", "s").withColumn("blk", lit("B")),
        "id", "id", "s", "s", "blk", "blk", maxDist = 2)
      .collect()
    assert(got.isEmpty)
  }

  test("blocked profile: counts consistent and candidates confined to " +
    "blocks (finer blocks can only shrink the candidate stages)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    def word() = (0 until 3 + rnd.nextInt(8))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val ls = (1L to 50L).map(i => i -> word())
    val rs = (101L to 150L).map(i => i -> word())
    def withBlk(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("blk", substring(col("s"), 1, 1))
    val blocked = Fuzzy.profile(withBlk(ls.toDF("id", "s")),
      withBlk(rs.toDF("id", "s")),
      "id", "id", "s", "s", "blk", "blk", maxDist = 2)
    val open = Fuzzy.Unblocked.profile(ls.toDF("id", "s"), rs.toDF("id", "s"),
      "id", "id", "s", "s", maxDist = 2)
    assert(blocked.outputPairs == runBlocked(ls, rs, 2).size)
    assert(blocked.gramCandidates + blocked.shortCandidates
      >= blocked.verifyCandidates)
    assert(blocked.verifyCandidates >= blocked.outputPairs)
    assert(blocked.gramCandidates <= open.gramCandidates)
    assert(blocked.shortCandidates <= open.shortCandidates)
    assert(blocked.outputPairs > 0)
  }

  test("circuit breaker: candidate volume past the budget fails loudly " +
    "BEFORE the verify stage, and an in-budget run is unaffected") {
    val s = spark
    import s.implicits._
    // every string identical: gram candidates = |L|·|R| = 400, the
    // degenerate population the unblocked contract warns about
    val ls = (1L to 20L).map(i => i -> "abcdefgh")
    val rs = (101L to 120L).map(i => i -> "abcdefgh")
    val ex = intercept[IllegalStateException] {
      Fuzzy.Unblocked.editDistanceJoin(ls.toDF("id", "s"), rs.toDF("id", "s"),
        "id", "id", "s", "s", maxDist = 2, candidateBudget = 100L)
    }
    assert(ex.getMessage.contains("candidateBudget"))
    assert(ex.getMessage.contains("Fuzzy.editDistanceJoin"))
    // the same input under the default budget still answers exactly
    assert(run(ls, rs, 2).size == 400)
    // short-only candidates trip the breaker too (zero gram candidates)
    val shorts = (1L to 20L).map(i => i -> "ab")
    val rShorts = (101L to 120L).map(i => i -> "cd")
    val exShort = intercept[IllegalStateException] {
      Fuzzy.Unblocked.editDistanceJoin(shorts.toDF("id", "s"),
        rShorts.toDF("id", "s"),
        "id", "id", "s", "s", maxDist = 2, candidateBudget = 100L)
    }
    assert(exShort.getMessage.contains("short"))
  }

  test("profile's stage counts are consistent with the join it profiles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def word() = (0 until 3 + rnd.nextInt(8))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val ls = (1L to 50L).map(i => i -> word())
    val rs = (101L to 150L).map(i => i -> word())
    val st = Fuzzy.Unblocked.profile(ls.toDF("id", "s"), rs.toDF("id", "s"),
      "id", "id", "s", "s", maxDist = 2)
    // output == the real join's output (profile measures, never alters)
    assert(st.outputPairs == run(ls, rs, 2).size)
    // each stage only prunes: candidates >= survivors >= output
    assert(st.gramCandidates + st.shortCandidates >= st.verifyCandidates)
    assert(st.verifyCandidates >= st.outputPairs)
    assert(st.outputPairs > 0, "fixture must produce pairs to be meaningful")
  }

  test("auto-waved blocked join: the predicted-volume trigger trips past " +
    "the ceiling, waves partition the output exactly, and a roomy " +
    "ceiling stays single-wave") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(717)
    def word() = (0 until 4 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val ls = (1L to 80L).map(i => i -> word())
    val rs = (101L to 180L).map(i => i -> word())
    def withBlk(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("blk", substring(col("s"), 1, 1))
    def auto(ceiling: Long): (Set[(Long, Long, Long)], Int) = {
      var waves = -1
      val got = Fuzzy.editDistanceJoinAutoWaved(withBlk(ls.toDF("id", "s")),
          withBlk(rs.toDF("id", "s")), "id", "id", "s", "s", "blk", "blk",
          maxDist = 2, waveCandidateCeiling = ceiling,
          onWaves = w => waves = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (got, waves)
    }
    val whole = runBlocked(ls, rs, 2)
    assert(whole.nonEmpty)
    // roomy ceiling: no waving, same answer
    val (one, w1) = auto(Long.MaxValue / 2)
    assert(w1 == 1 && one == whole)
    // tiny ceiling: the trigger must trip, and the waved union must be
    // bit-identical to the whole join (blocks are atomic across waves)
    val (waved, wN) = auto(50L)
    assert(wN > 1, s"expected the auto-wave trigger to trip, got $wN")
    assert(waved == whole)
    // the cap bounds a pathological prediction
    val (capped, wCap) = auto(1L)
    assert(wCap <= 64 && capped == whole)
  }

  test("environment-derived wave ceiling: a tiny scratch-byte budget " +
    "trips waving via the measured bytes-per-candidate, a roomy one " +
    "stays single-wave, and the answer never changes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(818)
    def word() = (0 until 4 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val ls = (1L to 80L).map(i => i -> word())
    val rs = (101L to 180L).map(i => i -> word())
    def withBlk(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("blk", substring(col("s"), 1, 1))
    def auto(budgetBytes: Long): (Set[(Long, Long, Long)], Int) = {
      var waves = -1
      val got = Fuzzy.editDistanceJoinAutoWaved(withBlk(ls.toDF("id", "s")),
          withBlk(rs.toDF("id", "s")), "id", "id", "s", "s", "blk", "blk",
          maxDist = 2, waveScratchBudgetBytes = budgetBytes,
          onWaves = w => waves = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (got, waves)
    }
    val whole = runBlocked(ls, rs, 2)
    // the default 6 GiB budget derives a ceiling far above this
    // fixture's candidate volume: single wave
    val (one, w1) = auto(Fuzzy.DefaultWaveScratchBudgetBytes)
    assert(w1 == 1 && one == whole)
    // ~5 KB budget / ~50 B-per-candidate strings => ceiling ~100,
    // below the fixture's candidate volume: the trigger must trip
    val (waved, wN) = auto(5000L)
    assert(wN > 1, s"expected the byte-budget trigger to trip, got $wN")
    assert(waved == whole)
  }

  test("auto-waved join under MULTI-BLOCK blocking emits each pair once " +
    "as a BAG: a pair matching in two blocks hashing to different waves " +
    "must dedup exactly like the whole join's verify-stage distinct") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(929)
    def word() = (0 until 4 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    // every record blocked into ALL of 8 block keys (the multi-block
    // linkage shape: a record appears under several blocking passes),
    // so each matching pair co-occurs in 8 blocks that spread across
    // wave hash classes
    val blocks = (0 until 8).map(b => s"b$b")
    val ls = (1L to 40L).map(i => i -> word())
    val rs = (101L to 140L).map(i => i -> word())
    def withBlks(rows: Seq[(Long, String)]) =
      rows.flatMap { case (i, w) => blocks.map(b => (i, w, b)) }
        .toDF("id", "s", "blk")
    def bag(df: org.apache.spark.sql.DataFrame): Map[(Long, Long, Long), Int] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).map { case (k, v) => k -> v.length }
    val whole = bag(Fuzzy.editDistanceJoin(withBlks(ls), withBlks(rs),
      "id", "id", "s", "s", "blk", "blk", maxDist = 2))
    assert(whole.nonEmpty && whole.values.forall(_ == 1),
      "the whole blocked join must already dedup multi-block pairs")
    var waves = -1
    val waved = bag(Fuzzy.editDistanceJoinAutoWaved(withBlks(ls),
      withBlks(rs), "id", "id", "s", "s", "blk", "blk", maxDist = 2,
      waveCandidateCeiling = 50L, onWaves = w => waves = w))
    assert(waves > 1, s"fixture must actually trip the wave trigger, got $waves")
    assert(waved == whole,
      "waved union must be bag-identical to the whole join")
  }
}
