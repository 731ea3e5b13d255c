package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BottomKSelect, SelKey}

/** ScalaCheck laws for the bounded bottom-k SELECTION aggregator
  * (TopKAggregator's sibling behind x5/x10): any fold/merge schedule
  * must equal sorting the whole input by (key, id) and taking k — the
  * property Spark's partial aggregation relies on — including under
  * duplicate keys (hash collisions, id tie-break) and +Infinity keys
  * (zero-weight rows in the Efraimidis–Spirakis race).
  */
class BottomKSelectSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  private val agg = new BottomKSelect(3)
  private val ord: Ordering[SelKey] = Ordering.by(s => (s.key, s.id))
  private def expected(xs: List[SelKey]) = xs.sorted(ord).take(3)

  // few distinct keys (collisions likely), occasional +Infinity, and
  // colliding ids across elements
  private val genKey: Gen[SelKey] = for {
    k <- Gen.frequency(
      8 -> Gen.chooseNum(-5.0, 5.0),
      2 -> Gen.oneOf(0.0, 1.0, Double.PositiveInfinity))
    id <- Gen.chooseNum(0L, 50L)
  } yield SelKey(k, id)

  test("sequential fold equals global sort-take, ranks in buffer order") {
    check(Prop.forAll(Gen.listOf(genKey)) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce).vs == expected(xs)
    })
  }

  test("any split-and-merge schedule equals global sort-take") {
    val gen = for {
      xs <- Gen.listOf(genKey)
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      m.vs == expected(xs)
    })
  }

  test("merge is commutative and associative") {
    val g = Gen.listOf(genKey)
    check(Prop.forAll(g, g, g) { (a, b, c) =>
      def fold(xs: List[SelKey]) = xs.foldLeft(agg.zero)(agg.reduce)
      val (ba, bb, bc) = (fold(a), fold(b), fold(c))
      agg.merge(ba, bb) == agg.merge(bb, ba) &&
        agg.merge(agg.merge(ba, bb), bc) == agg.merge(ba, agg.merge(bb, bc))
    })
  }

  test("buffer is always sorted and never exceeds k") {
    check(Prop.forAll(Gen.listOf(genKey)) { xs =>
      val b = xs.foldLeft(agg.zero)(agg.reduce).vs
      b.size <= 3 && b == b.sorted(ord)
    })
  }
}
