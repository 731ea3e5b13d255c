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
}
