package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAggregator, TopKBuf}

/** ScalaCheck laws for the bounded top-k Aggregator: any fold/merge
  * schedule must give the same result as sorting the whole input —
  * the property Spark's partial aggregation relies on.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  private val agg = new TopKAggregator(3)
  private def expected(xs: List[Double]) =
    xs.sorted(Ordering[Double].reverse).take(3)

  test("sequential fold equals global sort-take") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6))) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).vs == expected(xs)
    })
  }

  test("any split-and-merge schedule equals global sort-take") {
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1e6, 1e6))
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      m.vs == expected(xs)
    })
  }

  test("merge is commutative") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6)),
      Gen.listOf(Gen.chooseNum(-1e6, 1e6))) { (a, b) =>
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    })
  }

  test("buffer never exceeds k") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6))) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).vs.size <= 3
    })
  }
}
