package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Misra–Gries keeps its theorem under arbitrary partial-aggregation
  * trees: after any split/merge of the stream, every item with true
  * count > n/k survives, every estimate is a lower bound, and the
  * undercount is at most n/k (Agarwal et al. 2013, mergeable
  * summaries). These are the invariants `agg_heavy_hitters` gates
  * end-to-end; here they are property-tested over random streams and
  * random merge shapes.
  */
object MisraGriesSpec extends Properties("misra-gries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(80)

  // Skewed alphabet: a couple of hot items plus a long cold tail, so
  // streams routinely contain both survivors and evicted items.
  private val itemGen: Gen[String] =
    Gen.frequency(
      5 -> Gen.const("hot_a"),
      3 -> Gen.const("hot_b"),
      4 -> Gen.choose(0, 30).map(i => s"cold_$i"))

  private val streamGen: Gen[List[String]] =
    Gen.choose(0, 300).flatMap(Gen.listOfN(_, itemGen))

  private val kGen: Gen[Int] = Gen.choose(2, 12)

  private def fold(agg: MisraGries, xs: List[String]): Map[String, Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def holds(summary: Map[String, Long], xs: List[String], k: Int): Prop = {
    val n = xs.length.toLong
    val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bound = n.toDouble / k
    val sizeOk = summary.size <= k - 1
    val lowerBound = summary.forall { case (i, est) => est <= exact.getOrElse(i, 0L) }
    val errorBound = summary.forall { case (i, est) => exact(i) - est <= bound + 1e-9 }
    val heavyKept = exact.forall { case (i, c) => c <= bound || summary.contains(i) }
    (Prop(sizeOk) :| "size <= k-1") && (Prop(lowerBound) :| "estimates are lower bounds") &&
      (Prop(errorBound) :| "undercount <= n/k") && (Prop(heavyKept) :| "items over n/k survive")
  }

  property("single-pass summary satisfies the MG guarantee") =
    Prop.forAll(streamGen, kGen) { (xs, k) =>
      holds(fold(new MisraGries(k), xs), xs, k)
    }

  property("guarantee survives a two-way split at any point") =
    Prop.forAll(streamGen, kGen, Gen.choose(0, 1000)) { (xs, k, cut) =>
      val agg = new MisraGries(k)
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      holds(agg.merge(fold(agg, l), fold(agg, r)), xs, k)
    }

  property("guarantee survives a random many-way merge tree") =
    Prop.forAll(streamGen, kGen, Gen.choose(2, 8)) { (xs, k, parts) =>
      val agg = new MisraGries(k)
      val chunks = if (xs.isEmpty) List(xs)
        else xs.grouped(math.max(1, xs.length / parts)).toList
      holds(chunks.map(fold(agg, _)).reduce(agg.merge), xs, k)
    }

  property("zero is a merge identity") =
    Prop.forAll(streamGen, kGen) { (xs, k) =>
      val agg = new MisraGries(k)
      val s = fold(agg, xs)
      agg.merge(s, agg.zero) == s && agg.merge(agg.zero, s) == s
    }

  property("finish orders by (-est, item) and preserves entries") =
    Prop.forAll(streamGen, kGen) { (xs, k) =>
      val agg = new MisraGries(k)
      val buf = fold(agg, xs)
      val out = agg.finish(buf)
      out.map(e => e.item -> e.est).toMap == buf &&
        out.sameElements(out.sortBy(e => (-e.est, e.item)))
    }
}
