package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}

/** TopKByScore is an associative, commutative, bounded aggregator — the
  * properties partial aggregation relies on — and its result equals a
  * plain sort-take, whatever the arrival order. */
object TopKSpec extends Properties("topk-aggregator") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val scoredGen: Gen[Scored] = for {
    s <- Gen.chooseNum(-100, 100).map(_ / 4.0) // coarse grid → frequent ties
    k <- Gen.chooseNum(0L, 50L)
  } yield Scored(s, k)

  private val listGen: Gen[List[Scored]] = Gen.choose(0, 40).flatMap(Gen.listOfN(_, scoredGen))
  private val kGen: Gen[Int] = Gen.choose(1, 6)

  private def expected(xs: List[Scored], k: Int): List[Scored] =
    xs.sortBy(s => (-s.score, s.key)).take(k)

  private def fold(agg: TopKByScore, xs: List[Scored]): Array[Scored] =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("fold-reduce equals sort-take") = Prop.forAll(listGen, kGen) { (xs, k) =>
    val agg = new TopKByScore(k)
    fold(agg, xs).toList == expected(xs, k)
  }

  property("merge of split halves equals whole, any split point") =
    Prop.forAll(listGen, kGen, Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new TopKByScore(k)
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      agg.merge(fold(agg, l), fold(agg, r)).toList == expected(xs, k)
    }

  property("merge is commutative and zero is identity") =
    Prop.forAll(listGen, listGen, kGen) { (xs, ys, k) =>
      val agg = new TopKByScore(k)
      val (a, b) = (fold(agg, xs), fold(agg, ys))
      agg.merge(a, b).toList == agg.merge(b, a).toList &&
        agg.merge(a, agg.zero).toList == a.toList
    }
}
