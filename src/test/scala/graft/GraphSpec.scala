package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpecBase {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank on a 3-cycle reproduces the integer recurrence by hand") {
    // N=3: r0 = 333333333333, base = (15*r0)/100 = 49999999999,
    // each node has exactly one predecessor with outdeg 1, so
    // R1 = base + (85*r0)/100 = 49999999999 + 283333333333 = 333333333332
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 1)
    assert(got == Map(1L -> 333333333332L, 2L -> 333333333332L, 3L -> 333333333332L))
  }

  test("pageRank leaks dangling mass by contract (documented, oracle-replayed)") {
    // N=2, edge 1→2 only: r0 = 5e11, base = 7.5e10.
    // R1(1) = base (no in-edges); R1(2) = base + (85*5e11)/100 = 5e11.
    // R2(2) = base + (85*R1(1))/100 = 7.5e10 + 63750000000 = 138750000000
    // — node 2's dangling mass is gone, not redistributed.
    val one = ranks(Seq((1L, 2L)), iters = 1)
    assert(one == Map(1L -> 75000000000L, 2L -> 500000000000L))
    val two = ranks(Seq((1L, 2L)), iters = 2)
    assert(two == Map(1L -> 75000000000L, 2L -> 138750000000L))
  }

  test("pageRank splits contributions by out-degree with truncating division") {
    // 1 → {2, 3}: outdeg(1)=2, r0 = 10^12/3 = 333333333333 (odd), so
    // each successor gets (r0 div 2) = 166666666666 — the truncated
    // unit is LOST, which is exactly what the oracle replays.
    val got = ranks(Seq((1L, 2L), (1L, 3L)), iters = 1)
    val base = 49999999999L
    val expected = base + 85L * 166666666666L / 100L
    assert(got(2L) == expected && got(3L) == expected)
    assert(got(1L) == base)
  }

  test("pageRank ranks the hub above spokes on a star and conserves order") {
    // spokes 2..5 all point at 1, and 1 points at 2: the hub must
    // dominate after any number of iterations
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val got = ranks(edges, iters = 3)
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    assert(got(3L) == got(4L) && got(4L) == got(5L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: hand graphs — triangle, square, K4, star, dup/reversed edges") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // 4-cycle has no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == Map.empty)
    // K4: 4 triangles, every node in 3
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // star: no triangles regardless of hub degree
    assert(tri((2L to 8L).map(i => (1L, i))) == Map.empty)
    // duplicate, reversed and self-loop edges must not change counts
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: differential vs brute force on a seeded random graph") {
    val rnd = new scala.util.Random(777)
    val n = 30
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val expected = (for {
      Seq(x, y, z) <- und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
        .combinations(3).toSeq
      if und((x, y)) && und((y, z)) && und((x, z))
      node <- Seq(x, y, z)
    } yield node).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(tri(edges) == expected)
  }
}
