package graft

import graft.mapreduce.{MapleJuiceJob, RangePartition, Workloads}
import graft.sources.Generators

/** The reference's Condorcet dataset scale (`votes.txt`: 100,000
  * ballots × 10 single-digit candidates, FIXTURES.md §3) regenerated
  * with the seeded generator and run through the full two-phase
  * Maple/Juice chain — the election must be identical under different
  * partition counts and partitioners (the reference's shuffle delivers
  * in arbitrary order; ours must too).
  */
class CondorcetScaleSpec extends SparkSpecBase {

  private val candidates = (0 to 9).map(_.toString)

  private def election(numPartitions: Int,
                       strategy: graft.mapreduce.PartitionStrategy): Map[String, String] = {
    val s = spark
    import s.implicits._
    val ballots = Generators.ballots(s, 100000, candidates, seed = 425)
    val p1 = MapleJuiceJob.run(ballots,
      Workloads.CondorcetMaple1, Workloads.CondorcetJuice1, numPartitions, strategy)
    MapleJuiceJob.run(p1.map(_._1),
      Workloads.CondorcetMaple2, new Workloads.CondorcetJuice2(10), 1, strategy)
      .collect().toMap
  }

  test("100k-ballot election is partitioning-invariant and well-formed") {
    val hash8 = election(8, graft.mapreduce.HashPartition)
    val range3 = election(3, RangePartition)
    assert(hash8 == range3)
    val wins = hash8.values.map(_.split(",")(0).toLong).sum
    assert(wins == 45, s"total pairwise wins must be C(10,2)=45, got $wins")
    // 100k uniform random ballots: no candidate should win all 9 pairs
    assert(!hash8.values.exists(_.endsWith("condorcet_winner")) ||
      hash8.values.count(_.endsWith("condorcet_winner")) <= 1)
  }
}
