package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{CatalogQuery, QueryModule, Tables}

/** The reference's three analytics workloads (SURVEY.md §2.10) plus its
  * headline distributed-grep query (§2.2 F1), re-expressed over the
  * driver's `documents`/`orders` tables so the DuckDB oracle can replay
  * them.
  *
  * Reference semantics preserved:
  *  - wordcount: one `(word, 1)` per token occurrence, sum by word
  *    (`mp3/src/maple/wordcount.go:7-15` + `mp3/src/juice/wordcount.go:7-15`);
  *  - wine-shaped query: filter on an equality column, then count token
  *    occurrences (NOT matching rows) grouped by a second column
  *    (`mp3/src/mj_wine/wine_maple.go:8-23` — emits once per "succulent"
  *    token in a Chardonnay row, grouped by column index 8);
  *  - Condorcet: phase 1 pairwise-majority per candidate pair with ties
  *    going to the lexicographically smaller candidate
  *    (`mp3/src/juice/condorcet_1.go:14-16` keeps "(a b)" when
  *    count1 >= count0), phase 2 global tally with the winner-iff
  *    `wins == numCandidates-1` threshold and max-win fallback set
  *    (`mp3/src/juice/condorcet_2.go:20-46`);
  *  - grep: regex match returning (source, ORIGINAL line number, line)
  *    (`mp0/src/finder/finder.go:19-44` — line numbers are positions in
  *    the unfiltered file, so the rank is computed before the filter).
  *
  * Ballots for Condorcet are derived deterministically from `orders` by
  * integer arithmetic both engines evaluate identically:
  * `score(ballot, c) = (o_orderkey * (c+1)) mod 101`, candidate ranked
  * before another iff (score, candidateId) is lexicographically smaller.
  */
object Parity extends QueryModule {

  private def t(s: SparkSession, dir: String) = Tables(s, dir)

  /** G1+A1: explode(split) + sum-by-key. Map-side partial aggregation
    * makes the shuffle O(distinct words), not O(tokens) — the combiner
    * the reference lacks (SURVEY.md §4.2). At 100 TB this is one scan +
    * one tiny shuffle.
    */
  private val wordcount = CatalogQuery(
    "p1_wordcount",
    (s, dir) => {
      import s.implicits._
      t(s, dir).documents
        .select(explode(split($"text", "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word")
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy($"word")
    },
    Some("""SELECT word, count(*) AS n_occurrences
           |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word
           |      FROM documents)
           |WHERE word <> ''
           |GROUP BY word ORDER BY word""".stripMargin),
    doc = "Reference wordcount (mp3/src/maple/wordcount.go:7-15)")

  /** F2+G3+A1: equality filter, per-OCCURRENCE token emit, sum by a
    * second column — the wine-reviews query shape. The filter prunes
    * rows before the explode, and only (source, text) are read from
    * parquet (column pruning).
    */
  private val wineTokens = CatalogQuery(
    "p2_wine_token_count",
    (s, dir) => {
      import s.implicits._
      t(s, dir).documents
        .filter($"lang" === "en")
        .select($"source", explode(split($"text", "\\s+")).as("word"))
        .filter($"word" === "hash")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy($"source")
    },
    Some("""SELECT source, count(*) AS n_occurrences
           |FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS word
           |      FROM documents WHERE lang = 'en')
           |WHERE word = 'hash'
           |GROUP BY source ORDER BY source""".stripMargin),
    doc = "Reference wine query (mp3/src/mj_wine/wine_maple.go:8-23): " +
      "counts token occurrences, not matching rows")

  /** The 10 unordered candidate pairs (a < b) of the 5-candidate
    * election, as a literal array — a within-row combination generator,
    * the Spark shape of the reference's per-ballot C(n,2) loop
    * (`mp3/src/maple/condorcet_1.go:8-24`). No join, no extra shuffle:
    * each ballot row explodes into exactly 10 vote rows.
    */
  private val numCandidates = 5
  private def pairLits = array(
    (for { a <- 0 until numCandidates; b <- a + 1 until numCandidates }
      yield struct(lit(a).as("ca"), lit(b).as("cb"))): _*)

  /** G2+A2+A3+A4: the full two-phase Condorcet election.
    * Phase 1 = pairwise majority per pair (shuffle keyed on the 10 pairs,
    * map-side partial sums → shuffle is O(pairs), not O(ballots·pairs)).
    * Phase 2 = global tally over numCandidates rows (trivially small —
    * the reference funnels this through a single reducer via a constant
    * key, `mp3/src/maple/condorcet_2.go:3-6`; here it is a 5-row window).
    */
  private val condorcet = CatalogQuery(
    "p3_condorcet",
    (s, dir) => {
      import s.implicits._
      val prefs = t(s, dir).orders
        .select($"o_orderkey".as("ballot"), explode(pairLits).as("pair"))
        .select(
          $"ballot",
          $"pair.ca".as("ca"),
          $"pair.cb".as("cb"),
          (($"ballot" * ($"pair.ca" + 1)) % 101).as("sa"),
          (($"ballot" * ($"pair.cb" + 1)) % 101).as("sb"))
        .select($"ca", $"cb",
          when($"sa" < $"sb" || ($"sa" === $"sb" && $"ca" < $"cb"), 1)
            .otherwise(0).as("vote"))
      val pairWinners = prefs
        .groupBy($"ca", $"cb")
        .agg(sum($"vote").as("votes_a"), count(lit(1)).as("n"))
        // tie -> smaller candidate, matching juice/condorcet_1.go:14-16
        .select(when($"votes_a" >= $"n" - $"votes_a", $"ca").otherwise($"cb").as("w"))
      val candidates = s.range(0, numCandidates).select($"id".cast("int").as("candidate"))
      val wins = candidates
        .join(pairWinners, $"w" === $"candidate", "left")
        .groupBy($"candidate")
        .agg(count($"w").as("n_wins"))
      wins
        .select(
          $"candidate".cast("long").as("candidate"),
          $"n_wins",
          // Deliberately-unpartitioned window (the WindowExec "No
          // Partition Defined" warning in bench logs): the frame is the
          // candidate tally — numCandidates rows regardless of ballot
          // count — so the single partition is bounded and safe at any
          // data scale. Do not "fix" by partitioning.
          ($"n_wins" === max($"n_wins").over(Window.partitionBy())).as("in_top_set"),
          ($"n_wins" === lit(numCandidates - 1)).as("is_condorcet_winner"))
        .orderBy($"candidate")
    },
    Some("""WITH cand AS (SELECT unnest(range(5)) AS c),
           |prefs AS (
           |  SELECT a.c AS ca, b.c AS cb,
           |    CASE WHEN ((o_orderkey*(a.c+1)) % 101 < (o_orderkey*(b.c+1)) % 101)
           |           OR ((o_orderkey*(a.c+1)) % 101 = (o_orderkey*(b.c+1)) % 101
           |               AND a.c < b.c)
           |         THEN 1 ELSE 0 END AS vote
           |  FROM orders, cand a, cand b WHERE a.c < b.c),
           |pair_winners AS (
           |  SELECT CASE WHEN sum(vote) >= count(*) - sum(vote) THEN ca ELSE cb END AS w
           |  FROM prefs GROUP BY ca, cb),
           |wins AS (
           |  SELECT c AS candidate, CAST(count(w) AS BIGINT) AS n_wins
           |  FROM cand LEFT JOIN pair_winners ON w = c GROUP BY c)
           |SELECT CAST(candidate AS BIGINT) AS candidate, n_wins,
           |       n_wins = max(n_wins) OVER () AS in_top_set,
           |       n_wins = 4 AS is_condorcet_winner
           |FROM wins ORDER BY candidate""".stripMargin),
    doc = "Reference two-phase Condorcet election " +
      "(mp3/src/maple/condorcet_1.go + mp3/src/juice/condorcet_2.go) " +
      "over ballots derived arithmetically from orders")

  /** F1: the mp0/mp1 distributed-grep query. Line numbers are ORIGINAL
    * per-source positions (rank before filter), like the reference's
    * per-file line counter. The regex filter itself can't push to
    * parquet, but the 3-column projection does.
    *
    * Scale note: the rank-then-filter window shuffles on `source` (the
    * file id) — exactly the reference's per-machine partitioning. For
    * raw text files the engine's LogSearch.grep does the same with
    * per-partition counters and no shuffle at all.
    */
  private val grep = CatalogQuery(
    "p4_grep",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      t(s, dir).documents
        .select($"source", $"doc_id", $"text")
        .withColumn("line_no", row_number().over(w).cast("long"))
        .filter($"text".rlike("join (a|the) (big|small)"))
        .select($"source", $"line_no", $"text")
        .orderBy($"source", $"line_no")
    },
    Some("""SELECT source, line_no, text FROM (
           |  SELECT source, text,
           |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
           |              AS BIGINT) AS line_no
           |  FROM documents)
           |WHERE regexp_matches(text, 'join (a|the) (big|small)')
           |ORDER BY source, line_no""".stripMargin),
    doc = "Reference distributed grep (mp0/src/finder/finder.go:19-44)")

  /** F1 at FILE grain: the reference greps real per-machine files with
    * per-file line counters (`mp0/src/finder/finder.go:28-37`), not a
    * table with a precomputed line column — so this row materializes
    * the documents relation as an actual multi-file text directory
    * (one `source=<src>/lines.txt` per source, lines in doc_id order,
    * built once per dataset via the IndexCache protocol) and greps it
    * through [[graft.sources.LogSearch.grepFiles]]: wholeTextFiles,
    * one task per file, 1-based per-file line numbers, no shuffle.
    * The oracle replays p4's rank-then-filter over the parquet table —
    * the two layouts must agree line-for-line, which also pins the
    * text materialization's ordering contract.
    */
  private val grepFilesQ = CatalogQuery(
    "p4b_grep_files",
    (s, dir) => {
      val txtDir = graft.sources.TextCorpus.ensureDocsText(s, dir)
      graft.sources.LogSearch
        .grepFiles(s, s"$txtDir/source=*/lines.txt",
          "join (a|the) (big|small)")
        .toDF()
        .select(
          regexp_extract(col("source"), "source=([^/]+)", 1).as("source"),
          col("lineNo").as("line_no"), col("line").as("text"))
        .orderBy(col("source"), col("line_no"))
    },
    Some("""SELECT source, line_no, text FROM (
           |  SELECT source, text,
           |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
           |              AS BIGINT) AS line_no
           |  FROM documents)
           |WHERE regexp_matches(text, 'join (a|the) (big|small)')
           |ORDER BY source, line_no""".stripMargin),
    doc = "Reference distributed grep at FILE grain " +
      "(mp0/src/finder/finder.go:28-37): a real per-source text " +
      "directory greped via wholeTextFiles with per-file 1-based " +
      "line counters — one task per file, no shuffle; oracle is the " +
      "table-grain rank-then-filter over the same relation")

  override def queries: Seq[CatalogQuery] =
    Seq(wordcount, wineTokens, condorcet, grep, grepFilesQ)
}
