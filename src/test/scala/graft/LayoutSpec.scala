package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpecBase {

  /** Reference Morton interleave: bit i of a -> bit 2i, bit i of b ->
    * bit 2i+1. The operator's shift/mask cascade must equal this loop.
    */
  private def refMorton(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a.toLong >> i) & 1L) << (2 * i)
      z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("mortonZ equals the bit-loop reference across corners and a sweep") {
    val s = spark
    import s.implicits._
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 0),
      (0, 65535), (65535, 65535), (12345, 54321)) ++
      (0 until 64).map(i => (i * 1021 % 65536, i * 2053 % 65536))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.mortonZ(col("a").cast("long"), col("b").cast("long")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == refMorton(a, b), s"morton($a,$b)")
    }
  }

  test("zorderAssign on a full 16x16 grid: every 16-row file is one " +
    "aligned 4x4 block — both envelope dimensions bounded at 3") {
    val s = spark
    import s.implicits._
    val grid = for (p <- 0L until 16L; q <- 0L until 16L) yield (p, q)
    val df = grid.toDF("p", "q").withColumn("uid", col("p") * 16 + col("q"))
    val stats = Layout.zorderAssign(df, col("p"), col("q"), "uid", 16)
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        (max(col("p")) - min(col("p"))).as("dp"),
        (max(col("q")) - min(col("q"))).as("dq"))
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getLong(1) == 16L, s"file ${r.get(0)} row count")
      // the z-curve fills each axis-aligned 4x4 quadrant contiguously,
      // so a 16-row file is exactly one such block; a single-key sort
      // would give dq = 15 in every file
      assert(r.getLong(2) == 3L && r.getLong(3) == 3L,
        s"file ${r.get(0)} envelope (${r.getLong(2)}, ${r.getLong(3)})")
    }
  }

  test("zorderAssign file ids are the (z, uid)-sorted ranks div rowsPerFile") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2026)
    val rows = (0L until 500L).map(i =>
      (i, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("uid", "p", "q")
    val got = Layout.zorderAssign(df, col("p"), col("q"), "uid", 64)
      .select(col("uid"), col("file_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows
      .map { case (uid, p, q) => uid -> refMorton(p.toInt, q.toInt) }
      .sortBy { case (uid, z) => (z, uid) }
      .zipWithIndex
      .map { case ((uid, _), rank) => uid -> (rank / 64).toLong }
      .toMap
    assert(got == expected)
  }

  test("zorderAssign handles uids far beyond any bit-packing budget: the " +
    "composite (z, uid) rank never folds uid bits into the curve") {
    val s = spark
    import s.implicits._
    // uids at ~10^16 (the x14 4-tuple packing's magnitude) — the old
    // z<<30|uid packed key would silently bend the curve here; the
    // composite-order rank must stay exact
    val rnd = new scala.util.Random(2029)
    val rows = (0L until 300L).map(i =>
      (i * 1000000000000L + rnd.nextInt(1000000),
        rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("uid", "p", "q")
    val got = Layout.zorderAssign(df, col("p"), col("q"), "uid", 32)
      .select(col("uid"), col("file_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows
      .map { case (uid, p, q) => uid -> refMorton(p.toInt, q.toInt) }
      .sortBy { case (uid, z) => (z, uid) }
      .zipWithIndex
      .map { case ((uid, _), rank) => uid -> (rank / 32).toLong }
      .toMap
    assert(got == expected)
  }

  test("rankBucket16Pair fails loudly when uid collides across rows that " +
    "differ on a dimension, and collapses FULLY identical duplicates") {
    val s = spark
    import s.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // colliding uid 7 with different a-values: must raise, not misassign
    val bad = Seq((7L, 10L, 1L), (7L, 20L, 1L), (8L, 30L, 2L))
      .toDF("uid", "a", "b")
    val e = intercept[Exception] {
      Layout.rankBucket16Pair(bad, "a", "b", "uid", 3L, "ca", "cb").collect()
    }
    assert(messages(e).exists(_.contains("not unique")),
      s"expected the uid-collision diagnosis, got: ${messages(e)}")
    // identical duplicate rows (TESTDATA sf0.001 has one such lineitem
    // pair) collapse onto one shared coordinate instead of failing
    val dup = Seq((7L, 10L, 1L), (7L, 10L, 1L), (8L, 30L, 2L))
      .toDF("uid", "a", "b")
    val got = Layout.rankBucket16Pair(dup, "a", "b", "uid", 3L, "ca", "cb")
      .select(col("uid"), col("ca"), col("cb")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 3)
    assert(got.filter(_._1 == 7L).distinct.length == 1,
      "identical duplicates must share one coordinate pair")
    // NULL uid: must raise in-plan, never silently drop the row at the
    // coordinate join
    val withNull = Seq((Some(7L), 10L, 1L), (None, 20L, 2L))
      .toDF("uid", "a", "b")
    val eNull = intercept[Exception] {
      Layout.rankBucket16Pair(withNull, "a", "b", "uid", 2L, "ca", "cb")
        .collect()
    }
    assert(messages(eNull).exists(_.contains("NULL uid")),
      s"expected the null-uid diagnosis, got: ${messages(eNull)}")
  }

  test("rankBucket16 is the exact equi-depth quantile coordinate, " +
    "skew-immune where pmod scatters") {
    val s = spark
    import s.implicits._
    // sparse quadratic domain: i^2 spans [0, 1e6) with growing gaps
    val rows = (0L until 1000L).map(i => (i, i * i))
    val df = rows.toDF("uid", "v")
    val got = Layout.rankBucket16(df, "v", "uid", n = 1000L, outCol = "c")
      .select(col("uid"), col("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (uid, _) =>
      // v = uid^2 is already sorted by uid, so rank = uid exactly
      assert(got(uid) == uid * 65536L / 1000L, s"uid $uid")
    }
    // the coordinate fills [0, 65536) evenly: every 1/16 stripe hit
    val stripes = got.values.map(_ / 4096).toSet
    assert(stripes == (0L until 16L).toSet, s"stripes $stripes")
  }

  test("zorderAssignRanked equals the local reference: quantile " +
    "coordinates -> morton -> rank div rowsPerFile") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2027)
    // skewed sparse values on both dimensions
    val rows = (0L until 400L).map { i =>
      val a = rnd.nextInt(1000).toLong; (i, a * a, rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("uid", "a", "b")
    val got = Layout.zorderAssignRanked(df, "a", "b", "uid", 32)
      .select(col("uid"), col("file_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.length.toLong
    def rankCoord(key: Seq[(Long, Long)]): Map[Long, Long] =
      key.sortBy { case (uid, v) => (v, uid) }.zipWithIndex
        .map { case ((uid, _), r) => uid -> r.toLong * 65536L / n }.toMap
    val ca = rankCoord(rows.map(r => (r._1, r._2)))
    val cb = rankCoord(rows.map(r => (r._1, r._3)))
    val expected = rows.map { case (uid, _, _) =>
        uid -> refMorton(ca(uid).toInt, cb(uid).toInt)
      }.sortBy { case (uid, z) => (z, uid) }.zipWithIndex
      .map { case ((uid, _), rank) => uid -> (rank / 32).toLong }.toMap
    assert(got == expected)
  }

  test("rankBucket16Pair (one folded skinny pass) is bit-identical to " +
    "two separate rankBucket16 passes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2028)
    // duplicate values on both dims so the uid tie-break matters
    val rows = (0L until 600L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(7).toLong * 1000000L))
    val df = rows.toDF("uid", "a", "b")
    val n = rows.length.toLong
    def m(got: org.apache.spark.sql.DataFrame) = got
      .select(col("uid"), col("ca"), col("cb"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val folded = m(Layout.rankBucket16Pair(df, "a", "b", "uid", n, "ca", "cb"))
    val twoPass = m(Layout.rankBucket16(
      Layout.rankBucket16(df, "a", "uid", n, "ca"), "b", "uid", n, "cb"))
    assert(folded == twoPass)
    assert(folded.size == rows.size)
  }

  test("rankBucket16 fails loudly when the caller-supplied n undercounts " +
    "the frame (the coordinate would silently leave [0, 65536))") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, i)).toDF("uid", "v")
    val e = intercept[Exception] {
      // stale count: n=50 but 100 rows -> top ranks reach coord 131070
      Layout.rankBucket16(df, "v", "uid", n = 50L, outCol = "c").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("outside [0, 65536)")),
      s"expected the undercount diagnosis, got: ${messages(e)}")
  }
}
