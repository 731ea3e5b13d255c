package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpecBase {

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asof join: ties match, no-prior rows stay null, latest wins") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, ts(10)), (2L, 1, ts(20)), (3L, 2, ts(5)))
      .toDF("id", "k", "lt")
    val right = Seq((1, ts(10), "exact"), (1, ts(15), "later"), (1, ts(2), "early"))
      .toDF("k", "rt", "tag")
    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("exact")) // tie at t=10 matches (<= semantics)
    assert(got(2L).contains("later")) // latest of {2,10,15} at t=20
    assert(got(3L).isEmpty)           // key 2 has no right rows at all
  }

  test("asof join: all carry columns come from the SAME latest right " +
    "row, internal NULLs preserved") {
    val s = spark
    import s.implicits._
    // latest right row (t=8) has a NULL tag: per-column carry would
    // skip it and attach t=3's tag while taking t=8's v — DuckDB ASOF
    // attaches the latest row wholesale.
    val left = Seq((1L, 1, ts(10))).toDF("id", "k", "lt")
    val right = Seq(
      (1, ts(3), Option("old"), Option(30)),
      (1, ts(8), None: Option[String], Option(80)))
      .toDF("k", "rt", "tag", "v")
    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "lt", "rt",
        Seq("tag", "v"))
      .select($"id", $"asof_tag", $"asof_v")
      .as[(Long, Option[String], Option[Int])].collect().toSeq
    assert(got == Seq((1L, None, Some(80))))
  }

  test("sessionize merges events within the gap and splits across it") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(25)),  // one session (gaps 10, 15)
      (1L, ts(70)),                              // gap 45 → new session
      (2L, ts(0))).toDF("user_id", "ts")
    val got = Temporal.sessionize(events, "user_id", "ts", gap = "30 minutes")
      .orderBy($"user_id", $"session_start")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, ts(0), ts(25), 3L),
      (1L, ts(70), ts(70), 1L),
      (2L, ts(0), ts(0), 1L)))
  }
}
