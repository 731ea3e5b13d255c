package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack

/** The distributed prefix sum against its single-threaded definition,
  * and invariance to how the range partitioner happens to cut the
  * order — the property that makes the two-level scan correct at any
  * cluster size.
  */
class SequencePackSpec extends SparkSpecBase {

  private def packed(numParts: Int) = {
    val s = spark
    import s.implicits._
    val docs = (0L until 257L).map(i => (i, (i * 7 + 3) % 41)) // incl. 0-weight rows
    SequencePack.withPackAssignment(
        docs.toDF("id", "w"), "id", "w", maxTokens = 100, numParts = numParts)
      .select($"id", $"w", $"start_tok", $"pack_id", $"n_boundary_crossings")
      .as[(Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
  }

  test("start_tok equals the sequential exclusive prefix sum") {
    val rows = packed(numParts = 5)
    var acc = 0L
    rows.foreach { case (_, w, start, pack, cross) =>
      assert(start == acc)
      assert(pack == start / 100)
      val expectCross =
        if (w == 0) 0L else (start + w - 1) / 100 - start / 100
      assert(cross == expectCross)
      acc += w
    }
    // the crafted weights DO straddle boundaries, or the test is vacuous
    assert(rows.map(_._5).sum > 0)
  }

  test("assignment is invariant to the partition count") {
    assert(packed(numParts = 2).toSeq == packed(numParts = 7).toSeq)
    assert(packed(numParts = 1).toSeq == packed(numParts = 7).toSeq)
  }

  test("no stage windows over the whole corpus (only the pid-bounded frame)") {
    val s = spark
    import s.implicits._
    val df = SequencePack.withPackAssignment(
      (0L until 64L).map(i => (i, i % 5)).toDF("id", "w"), "id", "w", 10, 4)
    val plan = df.queryExecution.executedPlan.toString
    // the data-sized window must be partitioned by __pid; the only
    // unpartitioned window is the numParts-row offsets fold
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("__pid")),
      s"expected a __pid-partitioned window in:\n$plan")
  }

  private def grouped(numParts: Int) = {
    val s = spark
    import s.implicits._
    // 3 groups with interleaved ids and 0-weight rows
    val rows = (0L until 211L).map(i =>
      (i, s"src${i % 3}", (i * 11 + 5) % 37))
    SequencePack.groupedPrefixSum(rows.toDF("id", "g", "w"),
        "g", "id", "w", numParts = numParts, outCol = "pb")
      .select($"id", $"g", $"w", $"pb")
      .as[(Long, String, Long, Long)]
      .collect().sortBy(_._1)
  }

  test("groupedPrefixSum equals the per-group sequential exclusive " +
    "prefix sum and is partition-count invariant") {
    val rows = grouped(numParts = 5)
    val acc = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { case (_, g, w, pb) =>
      assert(pb == acc.getOrElse(g, 0L), s"group $g")
      acc(g) = acc.getOrElse(g, 0L) + w
    }
    assert(grouped(numParts = 1).toSeq == rows.toSeq)
    assert(grouped(numParts = 7).toSeq == rows.toSeq)
  }
}
