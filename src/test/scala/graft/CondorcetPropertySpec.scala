package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.mapreduce.Workloads

/** Property tests of the Condorcet workload logic (pure, no Spark):
  * the election outcome must be invariant under ballot order (the
  * reference's shuffle delivers values in nondeterministic order,
  * SURVEY.md §2.6 P3/P4), and a declared Condorcet winner must beat
  * every other candidate head-to-head. Uses raw ScalaCheck (the
  * scalatestplus bridge isn't in the offline dependency cache).
  */
class CondorcetPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  private val candidates = Vector("a", "b", "c", "d")

  /** In-memory replay of the two-phase Maple/Juice pipeline. */
  private def runElection(ballots: Seq[String]): Map[String, String] = {
    val kv1 = ballots.flatMap(b => Workloads.CondorcetMaple1.maple(b).iterator.toSeq)
    val winners = kv1.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (k, kvs) =>
      Workloads.CondorcetJuice1.juice(k, kvs.map(_._2).iterator).iterator.toSeq
    }
    val kv2 = winners.flatMap { case (k, _) =>
      Workloads.CondorcetMaple2.maple(k).iterator.toSeq
    }
    kv2.groupBy(_._1).toSeq.flatMap { case (k, kvs) =>
      new Workloads.CondorcetJuice2(candidates.size)
        .juice(k, kvs.map(_._2).iterator).iterator.toSeq
    }.toMap
  }

  private val ballotGen: Gen[String] =
    Gen.long.map(seed => new scala.util.Random(seed).shuffle(candidates).mkString(","))
  private val ballotsGen: Gen[List[String]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, ballotGen))

  test("election outcome is invariant under ballot permutation") {
    check(Prop.forAll(ballotsGen, Gen.long) { (ballots, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ballots)
      runElection(ballots) == runElection(shuffled)
    })
  }

  test("a declared condorcet winner beats every other candidate pairwise") {
    check(Prop.forAll(ballotsGen) { ballots =>
      val result = runElection(ballots)
      val declared = result.collect {
        case (c, v) if v.endsWith(",condorcet_winner") => c
      }.toSet
      def prefers(ballot: Seq[String], x: String, y: String): Boolean =
        ballot.indexOf(x) < ballot.indexOf(y)
      declared.forall { w =>
        candidates.filter(_ != w).forall { other =>
          val parsed = ballots.map(_.split(",").toSeq)
          val wins = parsed.count(b => prefers(b, w, other))
          // ties go to the string-smaller candidate, like the reference
          wins > parsed.size - wins || (wins == parsed.size - wins && w < other)
        }
      }
    })
  }

  test("total pairwise wins always equals C(n,2)") {
    check(Prop.forAll(ballotsGen) { ballots =>
      val wins = runElection(ballots).values
        .map(_.split(",")(0).toLong).sum
      wins == candidates.size * (candidates.size - 1) / 2
    })
  }
}
