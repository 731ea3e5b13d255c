package graft

import graft.operators.Outliers

class OutliersSpec extends SparkSpecBase {

  private def run(rows: Seq[(Long, String, Double)]): Seq[(Long, String, Long)] = {
    val s = spark
    import s.implicits._
    Outliers.iqrOutliers(rows.toDF("event_id", "event_type", "value"),
        keyCol = "event_type", valueCol = "value",
        keepCols = Seq("event_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("exact-index quartiles: hand-computed Tukey fence") {
    // n=5 values 0,10,20,30,1000: h = p(n-1) integral, so p25=10,
    // p75=30, IQR=20 → fences [-20, 60]: only 1000 is out
    val rows = Seq(0d, 10d, 20d, 30d, 1000d).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
    assert(run(rows) == Seq((4L, "t", 1000000000L)))
  }

  test("interpolated quartiles land on exact quarter-integers") {
    // n=4 values 0,100,200,10000 (micro): h25=0.75 → p25 = 75 micro
    // exactly (a .75 fraction — the interpolation case); p75 =
    // 200 + 0.25·9800 = 2650 micro. IQR=2575 → hi = 2650+3862.5,
    // held exactly in eighth-units: only 10000 micro is out.
    val rows = Seq(0d, 100e-6, 200e-6, 10000e-6).zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
    assert(run(rows) == Seq((3L, "t", 10000L)))
  }

  test("fences are per-key: a value ordinary in one group flags in another") {
    val wide = (0 until 9).map(i => (i.toLong, "wide", i * 100.0))
    val tight = (10 until 19).map(i => (i.toLong, "tight", 5.0)) :+
      (19L, "tight", 800.0)
    // 800 sits inside wide's spread (0..800) but is tight's outlier
    val got = run(wide ++ tight)
    assert(got == Seq((19L, "tight", 800000000L)))
  }

  test("differential vs an in-memory replay on seeded random data") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 400).map { i =>
      val key = "k" + (i % 3)
      // mostly uniform with occasional 50x spikes
      val v = if (rnd.nextInt(40) == 0) rnd.nextDouble() * 5000
      else rnd.nextDouble() * 100
      (i.toLong, key, v)
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      val vs = grp.map(t => math.floor(t._3 * 1e6).toLong).sorted
      val n = vs.size
      def q4(p: Double): Long = {
        val h = p * (n - 1)
        val lo = vs(h.toInt)
        val hi = vs(math.ceil(h).toInt)
        // ×4 keeps the quarter-integer exact in integer space
        math.round(4 * (lo + (h - h.toInt) * (hi - lo)))
      }
      val (q25, q75) = (q4(0.25), q4(0.75))
      grp.filter { t =>
        val v8 = 8 * math.floor(t._3 * 1e6).toLong
        v8 < 2 * q25 - 3 * (q75 - q25) || v8 > 2 * q75 + 3 * (q75 - q25)
      }
    }.map(t => (t._1, t._2, math.floor(t._3 * 1e6).toLong)).sortBy(_._1)
    assert(run(rows) == expected)
  }

  test("pre-agg rank selection == per-row row_number ranking, exactly, " +
    "under heavy ties (the saturated-domain case the pre-agg exists for)") {
    // The shipped plan ranks the (key, v, cnt) pre-aggregate via
    // cumulative counts; this replays the round-14 per-row design
    // (row_number over raw rows) in-memory and demands bit-equality.
    // Ties are the load-bearing case: a tied value spans MANY ranks in
    // the row path but ONE cumulative range in the pre-agg path, and
    // the quartile neighbours h, h+1 can land inside the same tie run.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 600).map { i =>
      val key = "k" + (i % 4)
      // values drawn from a TINY domain (0..9, micro-scale) so ties
      // dominate and quartile ranks routinely fall mid-run, plus rare
      // spikes that must flag
      val v = if (rnd.nextInt(50) == 0) 500.0 + rnd.nextInt(100)
      else rnd.nextInt(10) * 1e-6
      (i.toLong, key, v)
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      // the row path, verbatim: sort every row, 0-based ranks, type-7
      val vs = grp.map(t => math.floor(t._3 * 1e6).toLong).sorted
      val n = vs.size
      def q4(num: Long): Long = { // num = 4h for p = num/(4(n-1))
        val lo = vs((num / 4).toInt)
        val hi = vs(math.min(num / 4 + (if (num % 4 == 0) 0 else 1), n - 1).toInt)
        4 * lo + (num % 4) * (hi - lo)
      }
      val q25 = q4(n - 1L)
      val q75 = q4(3 * (n - 1L))
      grp.filter { t =>
        val v8 = 8 * math.floor(t._3 * 1e6).toLong
        v8 < 2 * q25 - 3 * (q75 - q25) || v8 > 2 * q75 + 3 * (q75 - q25)
      }
    }.map(t => (t._1, t._2, math.floor(t._3 * 1e6).toLong)).sortBy(_._1)
    assert(expected.nonEmpty, "fixture must actually flag spikes")
    assert(run(rows) == expected)
  }

  test("pre-agg rank selection: single-value and n=1 groups degrade safely") {
    // n=1: h25 = h75 = 0, IQR = 0, the lone value is its own fence
    // (never flags); all-equal group: IQR = 0, only unequal rows could
    // flag and there are none
    val rows = Seq((0L, "one", 7.0)) ++
      (1 until 6).map(i => (i.toLong, "flat", 3.0))
    assert(run(rows).isEmpty)
  }

  // ---- rolling z-score (a11) ----

  /** (id, key, ts, value) → flagged (id, key, value_micro, mean_micro). */
  private def runZ(rows: Seq[(Long, String, Long, Double)], w: Int,
                   z: Int = 3): Seq[(Long, String, Long, Long)] = {
    val s = spark
    import s.implicits._
    Outliers.rollingZOutliers(
        rows.toDF("event_id", "event_type", "ts", "value"),
        keyCol = "event_type", valueCol = "value",
        timeCol = "ts", idCol = "event_id", w = w, z = z)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("rolling z: mean_micro FLOORS for negative window sums " +
    "(truncate-toward-zero would disagree with the oracle's //)") {
    // negative window whose sum does NOT divide evenly by n — dyadic
    // fractions so floor(v·1e6) is IEEE-exact: micros -250000,
    // -500000, -125000, sum -875000, n=3 → floor = -291667
    // (truncate-toward-zero would emit -291666, off by one vs DuckDB)
    val rows = Seq(
      (0L, "t", 0L, -0.25), (1L, "t", 1L, -0.5), (2L, "t", 2L, -0.125),
      (3L, "t", 3L, 1000.0))
    val got = runZ(rows, w = 3)
    assert(got.map(_._1) == Seq(3L))
    assert(got.head._4 == -291667L) // floor(-875000 / 3), not -291666
  }

  test("rolling z: spike vs a flat baseline flags (sigma=0 case)") {
    // flat 10.0 baseline → window variance 0 → ANY deviation flags;
    // the spike at id=6 and the later return-to-baseline points that
    // still see the spike inside their window
    val rows = (0L to 5L).map(i => (i, "t", i, 10.0)) :+
      ((6L, "t", 6L, 1000.0)) :+ ((7L, "t", 7L, 10.0))
    val got = runZ(rows, w = 4)
    // id6: baseline {10,10,10,10} flat, 1000 flags. id7: baseline
    // {10,10,10,1000} has huge variance; 10 is within 3 sigma.
    assert(got == Seq((6L, "t", 1000000000L, 10000000L)))
  }

  test("rolling z: no flag until the trailing window is full") {
    // only 3 predecessors at id=3 with w=4 → unflaggable by contract
    val rows = Seq((0L, "t", 0L, 5.0), (1L, "t", 1L, 5.0),
      (2L, "t", 2L, 5.0), (3L, "t", 3L, 900.0))
    assert(runZ(rows, w = 4).isEmpty)
    // same data with w=3: id=3 now has a full window and flags
    assert(runZ(rows, w = 3).map(_._1) == Seq(3L))
  }

  test("rolling z: exactly 3 sigma does NOT flag (strict inequality)") {
    // baseline micro {0,0,200,200}: S=400, Q=80000, n=4 →
    // mean=100, sigma=100 → mean+3sigma = 400 micro exactly.
    val base = Seq((0L, 0d), (1L, 0d), (2L, 200e-6), (3L, 200e-6))
    def withProbe(probeMicro: Long) =
      (base :+ ((4L, probeMicro / 1e6))).map { case (i, v) => (i, "t", i, v) }
    assert(runZ(withProbe(400L), w = 4).isEmpty)
    assert(runZ(withProbe(401L), w = 4) ==
      Seq((4L, "t", 401L, 100L)))
  }

  test("rolling z: differential vs in-memory replay on seeded data") {
    val rnd = new scala.util.Random(7)
    val w = 5
    val rows = (0 until 300).map { i =>
      val key = "k" + (i % 2)
      val v = if (rnd.nextInt(25) == 0) 2000 + rnd.nextDouble() * 3000
      else 40 + rnd.nextDouble() * 20
      // shuffled ids but ts follows i: ordering is by (ts, id)
      (1000L - i, key, i.toLong, v)
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
      val ordered = grp.sortBy(t => (t._3, t._1))
      ordered.indices.flatMap { ix =>
        if (ix < w) None
        else {
          val win = ordered.slice(ix - w, ix)
            .map(t => BigInt(math.floor(t._4 * 1e6).toLong))
          val v = BigInt(math.floor(ordered(ix)._4 * 1e6).toLong)
          val s = win.sum
          val q = win.map(x => x * x).sum
          val dev = BigInt(w) * v - s
          if (dev * dev > BigInt(9) * (BigInt(w) * q - s * s))
            Some((ordered(ix)._1, ordered(ix)._2, v.toLong,
              (s / w).toLong))
          else None
        }
      }
    }.sortBy(_._1)
    assert(runZ(rows, w = w) == expected)
  }
}
