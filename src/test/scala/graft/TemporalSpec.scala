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

  test("tolerance asof: stale matches null out, in-window and tie matches survive") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, ts(10)), (2L, 1, ts(60)), (3L, 1, ts(62)), (4L, 2, ts(5)))
      .toDF("id", "k", "lt")
    val right = Seq((1, ts(10), "exact"), (1, ts(58), "recent"))
      .toDF("k", "rt", "tag")
    val got = Temporal.asofJoinBackwardTolerance(left, right, Seq("k"),
        "lt", "rt", Seq("rt", "tag"), tolerance = "3 minutes")
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("exact"))  // tie: age 0 is inside any horizon
    assert(got(2L).contains("recent")) // age 2m <= 3m
    assert(got(3L).isEmpty)            // latest is 4m old: nulled, not matched
    assert(got(4L).isEmpty)            // no right rows at all
    // the unbounded form would have matched id=3 — the knob is real
    val unbounded = Temporal.asofJoinBackward(left, right, Seq("k"),
        "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(unbounded(3L).contains("recent"))
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

  test("asof join matches a brute-force reference on a seeded random schedule") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // nullable carry values + duplicate timestamps + keys with no
    // right rows at all — every edge the window formulation must honor
    val left = Seq.tabulate(120) { i =>
      (i.toLong, rnd.nextInt(6), ts(rnd.nextInt(50)))
    }
    val right = Seq.tabulate(80) { i =>
      (rnd.nextInt(4), ts(rnd.nextInt(50)),
        if (rnd.nextBoolean()) Some(s"v$i") else None, rnd.nextInt(100))
    }
    val gotRows = Temporal.asofJoinBackward(
        left.toDF("id", "k", "lt"), right.toDF("k", "rt", "tag", "v"),
        Seq("k"), "lt", "rt", Seq("rt", "tag", "v"))
      .select($"id", $"asof_rt", $"asof_tag", $"asof_v")
      .collect()
    // exactly one output row per left row — a regression to a
    // join-shaped plan that duplicates on ties would otherwise hide
    // behind the toMap below
    assert(gotRows.length == left.size)
    val got = gotRows
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getInt(3)))))
      .toMap
    // brute force: latest right row (ties -> any of the tied rows'
    // values must... the operator picks the LAST in (t, insertion)
    // order; replicate DuckDB ASOF: max rt <= lt, ties broken by scan
    // order, so compare only on pairs with a unique latest rt
    val expected = left.map { case (id, k, lt) =>
      val prior = right.filter(r => r._1 == k && !r._2.after(lt))
      id -> (if (prior.isEmpty) None else {
        val maxRt = prior.map(_._2.getTime).max
        val tied = prior.filter(_._2.getTime == maxRt)
        Some((tied, maxRt))
      })
    }.toMap
    left.foreach { case (id, _, _) =>
      (expected(id), got(id)) match {
        case (None, (gotRt, gotTag, gotV)) =>
          assert(gotRt.isEmpty && gotTag.isEmpty && gotV.isEmpty,
            s"row $id should have no match, got $gotTag/$gotV")
        case (Some((tied, maxRt)), (gotRt, gotTag, gotV)) =>
          assert(gotRt.exists(_.getTime == maxRt), s"row $id wrong asof time")
          // all carry columns must come from ONE of the tied latest rows
          assert(tied.exists(t => t._3 == gotTag && gotV.contains(t._4)),
            s"row $id carried ($gotTag, $gotV) not from any latest row $tied")
      }
    }
  }

  test("forward asof: ties match, no-later rows stay null, earliest wins") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, ts(10)), (2L, 1, ts(20)), (3L, 2, ts(5)))
      .toDF("id", "k", "lt")
    val right = Seq((1, ts(10), "exact"), (1, ts(15), "mid"), (1, ts(2), "early"))
      .toDF("k", "rt", "tag")
    val got = Temporal.asofJoinForward(left, right, Seq("k"), "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("exact")) // tie at t=10 matches (>= semantics)
    assert(got(2L).isEmpty)           // nothing at/after t=20
    assert(got(3L).isEmpty)           // key 2 has no right rows at all
  }

  test("nearest asof: picks the closer side, exact ties resolve backward") {
    val s = spark
    import s.implicits._
    // k=1 @10: back @8 (d=2) vs fwd @13 (d=3) -> back;
    // k=1 @20: back @13 (d=7) vs fwd @24 (d=4) -> fwd;
    // k=1 @30: back @24 (d=6) vs fwd @36 (d=6) -> TIE -> back;
    // k=2 @5: only forward exists; k=3 @5: only backward exists;
    // k=4: no right rows at all
    val left = Seq((1L, 1, ts(10)), (2L, 1, ts(20)), (3L, 1, ts(30)),
      (4L, 2, ts(5)), (5L, 3, ts(5)), (6L, 4, ts(5))).toDF("id", "k", "lt")
    val right = Seq((1, ts(8), "b8"), (1, ts(13), "m13"), (1, ts(24), "m24"),
      (1, ts(36), "f36"), (2, ts(9), "fwd_only"), (3, ts(1), "back_only"))
      .toDF("k", "rt", "tag")
    val got = Temporal.asofJoinNearest(left, right, Seq("k"), "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("b8"))
    assert(got(2L).contains("m24"))
    assert(got(3L).contains("m24")) // equidistant: backward wins
    assert(got(4L).contains("fwd_only"))
    assert(got(5L).contains("back_only"))
    assert(got(6L).isEmpty)
  }

  test("forward and nearest asof match brute force on a seeded random schedule") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val left = (0 until 60).map(i => (i.toLong, rnd.nextInt(4), ts(rnd.nextInt(50))))
    // distinct right timestamps per key so the matched row is unique
    // and the brute-force compare is exact
    val right = (for (k <- 0 until 3; m <- 0 until 50 if rnd.nextInt(4) == 0)
      yield (k, ts(m), s"v$k-$m")).toSeq
    val fwd = Temporal.asofJoinForward(
        left.toDF("id", "k", "lt"), right.toDF("k", "rt", "tag"),
        Seq("k"), "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    val near = Temporal.asofJoinNearest(
        left.toDF("id", "k", "lt"), right.toDF("k", "rt", "tag"),
        Seq("k"), "lt", "rt", Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(fwd.size == left.size && near.size == left.size)
    for ((id, k, lt) <- left) {
      val cands = right.filter(_._1 == k)
      val f = cands.filter(_._2.getTime >= lt.getTime)
        .sortBy(_._2.getTime).headOption.map(_._3)
      val b = cands.filter(_._2.getTime <= lt.getTime)
        .sortBy(-_._2.getTime).headOption.map(_._3)
      assert(fwd(id) == f, s"row $id forward: got ${fwd(id)}, want $f")
      val n = (b, f) match {
        case (None, x) => x
        case (x, None) => x
        case (Some(bb), Some(ff)) =>
          val db = lt.getTime - cands.find(_._3 == bb).get._2.getTime
          val dfw = cands.find(_._3 == ff).get._2.getTime - lt.getTime
          if (db <= dfw) Some(bb) else Some(ff)
      }
      assert(near(id) == n, s"row $id nearest: got ${near(id)}, want $n")
    }
  }

  test("sessionize matches a brute-force reference on a seeded random schedule") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val events = Seq.fill(150)((rnd.nextInt(5).toLong, ts(rnd.nextInt(600))))
    val got = Temporal.sessionize(events.toDF("user_id", "ts"),
        "user_id", "ts", gap = "30 minutes")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    val gapMs = 30 * 60000L
    val expected = events.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.map(_._2.getTime).sorted
      // split only on gap STRICTLY greater than 30min: session_window
      // merges adjacent [t, t+gap) windows, i.e. an event exactly
      // `gap` later continues the session. n_events counts EVENTS
      // (duplicates kept).
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, t) =>
          if (t - cur.head <= gapMs) (t :: cur) :: rest else List(t) :: acc
        case (Nil, t) => List(List(t))
      }
      sessions.map(ses => (u, ses.min, ses.max, ses.size.toLong))
    }.toSet
    assert(got == expected)
  }

  test("intervalFollowCount equals the brute-force inequality join") {
    val s = spark
    import s.implicits._
    // events straddling bucket boundaries: window = 30 min, so bucket
    // edges at 0/30/60...; include exact-boundary matches (strict >,
    // inclusive <= W) and cross-bucket matches
    val views = Seq((1L, 100L, ts(0)), (1L, 101L, ts(29)), (1L, 102L, ts(58)),
        (2L, 103L, ts(10)), (3L, 104L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val clicks = Seq((1L, ts(0)), (1L, ts(30)), (1L, ts(59)), (1L, ts(88)),
        (1L, ts(89)), (2L, ts(41)))
      .toDF("user_id", "ts")
    val got = Temporal.intervalFollowCount(views, clicks, "user_id",
        "event_id", "ts", "ts", windowMicros = 30L * 60 * 1000000)
      .orderBy($"event_id")
      .select($"event_id", $"n_follow").as[(Long, Long)].collect().toSeq
    // brute force per view: clicks with t_v < t_c <= t_v + 30
    // 100@0: clicks at 30 (boundary, kept) -> 1 (0 excluded: strict >)
    // 101@29: 30, 59 -> 2;  102@58: 59, 88 -> 2
    // 103@10: user 2 click at 41 is 31 min later -> 0
    // 104: user 3 has no clicks -> 0
    assert(got == Seq((100L, 1L), (101L, 2L), (102L, 2L), (103L, 0L),
      (104L, 0L)))
  }

  test("resampleLocf aligns the grid to step multiples and carries forward") {
    val s = spark
    import s.implicits._
    // step = 600s (10 min); events at minutes 5, 12, 47 → grid at 10,
    // 20, 30, 40 (ceil(5m)=10m .. floor(47m)=40m), carrying 5,12,12,12
    val events = Seq((1L, ts(5), 50.0), (1L, ts(12), 51.0), (1L, ts(47), 52.0),
        (2L, ts(0), 60.0), // exactly on a grid point: lo == hi == 0
        (3L, ts(11), 70.0), (3L, ts(14), 71.0)) // span inside one step:
          // no aligned point exists (lo 20 > hi 10) -> zero grid rows,
          // NOT a sequence() crash
      .toDF("user_id", "ts", "value")
    val got = Temporal.resampleLocf(events, "user_id", "ts",
        carryCols = Seq("value"), stepSec = 600L)
      .orderBy($"user_id", $"grid_ts")
      .select($"user_id", $"grid_ts", $"asof_value")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    assert(got == Seq(
      (1L, ts(10), 50.0), (1L, ts(20), 51.0), (1L, ts(30), 51.0),
      (1L, ts(40), 51.0),
      (2L, ts(0), 60.0)))
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

  test("funnel: out-of-order steps don't convert; strict >; partial funnels counted") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: full conversion in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE the first view — must not convert;
      // purchase after view but with no qualifying click -> steps=1
      (2L, ts(3), "click"), (2L, ts(4), "view"), (2L, ts(8), "purchase"),
      // user 3: click at EXACTLY the view time (strict > excludes it);
      // a later click converts, no purchase -> steps=2
      (3L, ts(2), "view"), (3L, ts(2), "click"), (3L, ts(6), "click"),
      // user 4: never views -> steps=0
      (4L, ts(1), "purchase"), (4L, ts(2), "signup"))
      .toDF("user_id", "t", "ty")
    val got = Temporal.funnel(ev, "user_id", "t", "ty",
        Seq("view", "click", "purchase"))
      .orderBy($"k")
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, Some(ts(0)), Some(ts(5)), Some(ts(9)), 3L),
      (2L, Some(ts(4)), None, None, 1L),
      (3L, Some(ts(2)), Some(ts(6)), None, 2L),
      (4L, None, None, None, 0L)))
  }

  test("resampleInterp: exact samples, hand-computed midpoints, " +
    "truncating division on a negative slope") {
    val s = spark
    import s.implicits._
    def tss(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // k=1: rise 10→40 then fall 40→10; grid 600..2400 step 600
      (1, tss(600), 10.0), (1, tss(1800), 40.0), (1, tss(2400), 10.0),
      // k=2: positive slope, grid point at 3/5 of the bracket
      (2, tss(0), 0.0), (2, tss(1000), 1.0),
      // k=3: negative slope, non-divisible ratio — pins the
      // truncate-toward-zero contract ((-6e11) div 9e5 = -666666,
      // where floor division would give -666667)
      (3, tss(0), 1.0), (3, tss(900), 0.0))
      .toDF("k", "t", "v")
    val got = Temporal.resampleInterp(ev, "k", "t", "v", stepSec = 600L)
      .select($"k", $"grid_ts".cast("long"), $"interp_micro")
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (1, 600L, 10000000L), (1, 1200L, 25000000L),
      (1, 1800L, 40000000L), (1, 2400L, 10000000L),
      (2, 0L, 0L), (2, 600L, 600000L),
      (3, 0L, 1000000L), (3, 600L, 333334L)))
  }

  test("resampleInterp agrees with resampleLocf on sample-aligned grid points") {
    val s = spark
    import s.implicits._
    def tss(sec: Long) = new Timestamp(sec * 1000L)
    // every event sits ON the grid, so interpolation must reproduce
    // the carried sample exactly (tb == tf guard path)
    val ev = Seq.tabulate(8)(i => (1, tss(i * 600L), i * 1.5))
      .toDF("k", "t", "v")
    val interp = Temporal.resampleInterp(ev, "k", "t", "v", 600L)
      .select($"grid_ts".cast("long"), $"interp_micro")
      .as[(Long, Long)].collect().toMap
    val locf = Temporal.resampleLocf(ev, "k", "t", Seq("v"), 600L)
      .select($"grid_ts".cast("long"),
        floor($"asof_v" * lit(1000000)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(interp.size == 8 && interp == locf)
  }

  test("resampleLocf: pre-1970 spans floor/ceil to the grid exactly " +
    "(float truncation toward zero would fabricate an epoch-0 point)") {
    val s = spark
    import s.implicits._
    def tss(sec: Long) = new Timestamp(sec * 1000L)
    // span [-100s, -10s], step 60: the only in-span multiple is -60 —
    // truncation toward zero would put g0 = g1 = 0, OUTSIDE the span
    val ev = Seq((1L, 10L, tss(-100L), 7.0), (1L, 11L, tss(-10L), 9.0))
      .toDF("k", "id", "t", "v")
    val got = Temporal.resampleLocf(ev, "k", "t", Seq("v"), stepSec = 60L)
      .select($"grid_ts".cast("long"), $"asof_v").as[(Long, Double)]
      .collect().toSeq
    assert(got == Seq((-60L, 7.0)))
  }

  test("timeWeightedAvg: a key whose events all share one timestamp " +
    "emits no row (zero total interval), like a singleton") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 1L, ts(5), 2.0), (1L, 2L, ts(5), 4.0), (1L, 3L, ts(5), 6.0),
      (2L, 4L, ts(0), 1.0), (2L, 5L, ts(10), 1.0))
      .toDF("k", "id", "t", "v")
    val got = Temporal.timeWeightedAvg(ev, "k", "t", "v", tieCol = "id")
      .select($"k").as[Long].collect().toSeq
    assert(got == Seq(2L)) // key 1: den = 0 -> dropped, not a null row
  }

  test("tolerance asof: schema equals the unbounded form's when the " +
    "right time is not in carryCols") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, ts(10))).toDF("id", "k", "lt")
    val right = Seq((1, ts(8), "x")).toDF("k", "rt", "tag")
    val bounded = Temporal.asofJoinBackwardTolerance(left, right, Seq("k"),
      "lt", "rt", Seq("tag"), tolerance = "10 minutes")
    val unbounded = Temporal.asofJoinBackward(left, right, Seq("k"),
      "lt", "rt", Seq("tag"))
    assert(bounded.columns.toSeq == unbounded.columns.toSeq)
    assert(bounded.select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toSeq == Seq((1L, Some("x"))))
  }

  test("timeWeightedAvg: hand-computed integral, tie order fixed, singletons drop") {
    val s = spark
    import s.implicits._
    // user 1: v=2.0 held 10 min, v=4.0 held 5 min, last row spans nothing
    //   num = 200c*600e6us + 400c*300e6us = 240e12; den = 900e6
    //   twap = 240e12/900e6 = 266666.67 c·micro → value 2.666667
    // user 2: single observation → no row
    // user 3: tie at t=0 broken by id (id=1 first, dt=0; id=2 spans)
    val ev = Seq(
      (1L, 1L, ts(0), 2.0), (1L, 2L, ts(10), 4.0), (1L, 3L, ts(15), 9.9),
      (2L, 4L, ts(0), 5.0),
      (3L, 5L, ts(0), 1.0), (3L, 6L, ts(0), 3.0), (3L, 7L, ts(10), 0.0))
      .toDF("k", "id", "t", "v")
    val got = Temporal.timeWeightedAvg(ev, "k", "t", "v", tieCol = "id")
      .orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val min10 = 10L * 60 * 1000000
    assert(got.toSeq == Seq(
      (1L, 200L * min10 + 400L * (min10 / 2), min10 + min10 / 2,
        math.floor((200.0 * min10 + 400.0 * (min10 / 2)) /
          (min10 + min10 / 2) * 10000 + 0.5).toLong),
      // user 3: id=5 spans 0 micros, id=6 (v=3.0 → 300c) spans 10 min
      (3L, 300L * min10, min10, 3000000L)))
  }

  private def motifs(ev: Seq[(Long, Long, Timestamp, String)],
                     motif: Seq[String]): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    Temporal.motifCount(ev.toDF("k", "id", "t", "ty"), "k", "t", "id",
        "ty", motif)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("motifCount: contiguity required, overlaps counted, zero rows explicit") {
    val ev = Seq(
      // user 1: A B A B → AB at positions 1 and 3
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(1), "B"),
      (1L, 3L, ts(2), "A"), (1L, 4L, ts(3), "B"),
      // user 2: A X B — the gap breaks contiguity (a9's funnel would count it)
      (2L, 5L, ts(0), "A"), (2L, 6L, ts(1), "X"), (2L, 7L, ts(2), "B"),
      // user 3: A A A → overlapping AA counts twice
      (3L, 8L, ts(0), "A"), (3L, 9L, ts(1), "A"), (3L, 10L, ts(2), "A"),
      // user 4: shorter than the motif → explicit zero row
      (4L, 11L, ts(0), "A"))
    val got = motifs(ev, Seq("A", "B"))
    assert(got == Map(1L -> (4L, 2L), 2L -> (3L, 0L), 3L -> (3L, 0L),
      4L -> (1L, 0L)))
    val aa = motifs(ev, Seq("A", "A"))
    assert(aa(3L) == (3L, 2L) && aa(1L) == (4L, 0L))
  }

  test("motifCount: order is (ts, tie) — a timestamp tie can't flip the match") {
    // both events at t=0: id order makes the sequence A then B
    val ev = Seq((1L, 1L, ts(0), "A"), (1L, 2L, ts(0), "B"))
    assert(motifs(ev, Seq("A", "B"))(1L) == (2L, 1L))
    assert(motifs(ev, Seq("B", "A"))(1L) == (2L, 0L))
  }

  test("ohlcBars: hand-computed bars — tie ids, singleton buckets, bucket edges") {
    val s = spark
    import s.implicits._
    // key A, hour 0: events (t, id, v) = (0,1,5.0)(0,2,1.0)(30,3,9.0)
    //   → open decided by id at the t=0 tie: id 1 → 5.0; close 9.0
    // key A, hour 1: single event → open=high=low=close
    // key B, hour 0: descending values → open 7.0, close 2.0
    val ev = Seq(
      ("A", 1L, ts(0), 5.0), ("A", 2L, ts(0), 1.0), ("A", 3L, ts(30), 9.0),
      ("A", 4L, ts(75), 4.5),
      ("B", 5L, ts(10), 7.0), ("B", 6L, ts(20), 2.0))
      .toDF("k", "id", "t", "v")
    val got = Temporal.ohlcBars(ev, "k", "t", "id", "v")
      .orderBy($"k", $"bucket_ts")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("A", 3L, 5.0, 9.0, 1.0, 9.0),
      ("A", 1L, 4.5, 4.5, 4.5, 4.5),
      ("B", 2L, 7.0, 7.0, 2.0, 2.0)))
  }

  test("ohlcBars equals the window first/last twin on real events") {
    val e = graft.core.Tables(spark, sf("sf0.001")).events
    val got = Temporal.ohlcBars(e, "event_type", "ts", "event_id", "value")
      .orderBy(col("event_type"), col("bucket_ts")).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bucket_ts"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Long.MinValue, Long.MaxValue)
    val twin = e
      .withColumn("bucket_ts", date_trunc("hour", col("ts")))
      .withColumn("open", first(col("value")).over(full))
      .withColumn("close", last(col("value")).over(full))
      .groupBy(col("event_type"), col("bucket_ts"))
      .agg(count(lit(1)).as("n_events"), max(col("open")).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(col("close")).as("close"))
      .select(col("event_type"), col("bucket_ts"), col("n_events"),
        col("open"), col("high"), col("low"), col("close"))
      .orderBy(col("event_type"), col("bucket_ts")).collect().toSeq
    assert(got.nonEmpty && got == twin)
  }

  test("motifCount: differential vs in-memory scan on a seeded random stream") {
    val rnd = new scala.util.Random(2028)
    val types = Vector("A", "B", "C")
    val ev = (1 to 400).map(i => ((rnd.nextInt(8) + 1).toLong, i.toLong,
      ts(rnd.nextInt(60)), types(rnd.nextInt(3))))
    val motif = Seq("A", "B")
    val ref = ev.groupBy(_._1).map { case (k, es) =>
      val seq = es.sortBy(e => (e._3.getTime, e._2)).map(_._4)
      val hits = seq.sliding(motif.size).count(_ == motif)
      k -> (es.size.toLong, hits.toLong)
    }
    assert(motifs(ev, motif) == ref)
  }

  test("dyadicEwma: hand weights, full-window-only, id tie-break") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "k", ts(1), 1.0), (2L, "k", ts(2), 2.0), (3L, "k", ts(3), 4.0),
      // same timestamp: id orders the window, so id=5's lag is id=4
      (4L, "t", ts(1), 6.0), (5L, "t", ts(1), 3.0),
      (6L, "solo", ts(1), 9.0)) // one event < w: never emits
      .toDF("event_id", "key", "time", "value")
    val byId = Temporal.dyadicEwma(ev, "key", "value", "time", "event_id", w = 2)
      .select($"event_id", $"ewma_micro").as[(Long, Long)].collect().toMap
    assert(byId.keySet == Set(2L, 3L, 5L)) // firsts and the singleton drop
    assert(byId(2L) == (2L * 2000000L + 1000000L) / 3)  // 1666666
    assert(byId(3L) == (2L * 4000000L + 2000000L) / 3)  // 3333333
    assert(byId(5L) == (2L * 3000000L + 6000000L) / 3)  // newest=id5 weights 2
  }

  test("dyadicEwma: differential vs sequential fold on a seeded stream") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2031)
    val ev = (1 to 500).map(i => (i.toLong, (rnd.nextInt(6) + 1).toString,
      ts(rnd.nextInt(120)), rnd.nextDouble() * 100))
    val w = 4
    val ref = ev.groupBy(_._2).flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._3.getTime, e._1))
      val micros = ord.map(e => math.floor(e._4 * 1000000L).toLong)
      ord.indices.drop(w - 1).map { i =>
        val num = (0 until w).map(j => micros(i - j) * (1L << (w - 1 - j))).sum
        ord(i)._1 -> num / ((1L << w) - 1)
      }
    }.toMap
    val got = Temporal.dyadicEwma(ev.toDF("event_id", "key", "time", "value"),
        "key", "value", "time", "event_id", w = w)
      .select($"event_id", $"ewma_micro").as[(Long, Long)].collect().toMap
    assert(got == ref && got.nonEmpty)
  }

  private def dayTs(day: Int, h: Int, m: Int) =
    new Timestamp(((day * 24L + h) * 60 + m) * 60000L)

  private def peaks(sess: Seq[(Timestamp, Timestamp)],
                    numParts: Int = 0): Seq[(String, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Temporal.peakConcurrency(sess.toDF("st", "en"), "st", "en", numParts)
      .select(col("day").cast("string"), col("peak_concurrent"),
        col("n_starts"), col("n_ends"))
      .orderBy(col("day"))
      .as[(String, Long, Long, Long)].collect().toSeq
  }

  test("peakConcurrency: closed-interval tie counts both, midnight carry, " +
    "quiet days absent") {
    val got = peaks(Seq(
      (dayTs(0, 10, 0), dayTs(0, 11, 0)),   // A
      (dayTs(0, 10, 30), dayTs(0, 12, 0)),  // B
      (dayTs(0, 11, 0), dayTs(0, 11, 30)),  // C starts the instant A ends
      (dayTs(0, 23, 0), dayTs(1, 1, 0)),    // D straddles midnight
      (dayTs(1, 0, 30), dayTs(1, 2, 0)),    // E overlaps the carried D
      (dayTs(4, 9, 0), dayTs(4, 9, 5))))    // F after two silent days
    assert(got == Seq(
      // peak 3 at 11:00 only if the closed-interval tie (C's +1 before
      // A's −1) counts A, B and C together
      ("1970-01-01", 3L, 4L, 3L),
      // day-2 peak 2 only if D's midnight-straddling +1 carries into
      // the day-2 running sum without a boundary row on day 2
      ("1970-01-02", 2L, 1L, 2L),
      // days 3 and 4 have no boundaries: absent, not zero
      ("1970-01-05", 1L, 1L, 1L)))
  }

  test("peakConcurrency: a day whose ONLY boundaries are ends reports the " +
    "carry-in peak (concurrency AT the boundary, not after it)") {
    // Two sessions start on day 0 and overlap into day 1; day 1's only
    // boundaries are their two ends. At the first end (01:00) both are
    // still active (closed intervals), so day-1 peak is 2 — the
    // max-over-POST-boundary formulation would report 1.
    val got = peaks(Seq(
      (dayTs(0, 22, 0), dayTs(1, 1, 0)),
      (dayTs(0, 23, 0), dayTs(1, 2, 0))))
    assert(got == Seq(
      ("1970-01-01", 2L, 2L, 0L),
      ("1970-01-02", 2L, 0L, 2L)))
  }

  test("peakConcurrency: differential vs the sequential sweep; invariant " +
    "to the partition count") {
    val rnd = new scala.util.Random(2029)
    // minute-grain times force boundary ties (same-instant starts/ends)
    val sess = (1 to 300).map { _ =>
      val start = rnd.nextInt(6 * 24 * 60).toLong * 60000L
      val end = start + (rnd.nextInt(36 * 60) + 1).toLong * 60000L
      (new Timestamp(start), new Timestamp(end))
    }
    // sequential reference: same packed (micros*2 + end-bit) order
    val bounds = sess.flatMap { case (st, en) =>
      Seq((st.getTime * 2000L, 1L), (en.getTime * 2000L + 1, -1L))
    }.sortBy(_._1)
    var run = 0L
    val byDay = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    bounds.foreach { case (key, d) =>
      run += d
      // concurrency AT the boundary: a closed-interval end still
      // counts its own session, so undo the −1 it just applied
      val atBoundary = run + (if (d < 0) 1 else 0)
      val day = (key / 2000L) / 86400000L
      val (p, ns, ne) = byDay.getOrElse(day, (Long.MinValue, 0L, 0L))
      byDay(day) = (math.max(p, atBoundary),
        ns + (if (d > 0) 1 else 0), ne + (if (d < 0) 1 else 0))
    }
    val ref = byDay.toSeq.sortBy(_._1).map { case (day, (p, ns, ne)) =>
      (java.time.LocalDate.ofEpochDay(day).toString, p, ns, ne)
    }
    assert(peaks(sess) == ref)
    assert(peaks(sess, numParts = 3) == ref)
    assert(peaks(sess, numParts = 17) == ref)
  }
}
