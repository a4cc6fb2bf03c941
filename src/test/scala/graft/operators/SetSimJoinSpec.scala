package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Differential proof of the prefix-filtered set-similarity join: on
  * randomized corpora (shared vocabulary, heavy token reuse — the
  * adversarial case for prefix filtering) the operator must emit
  * EXACTLY the pairs a brute-force all-pairs Jaccard finds, with the
  * same integer-ppm scores. A miss here means the prefix-length
  * theorem was mis-applied (candidate loss); an extra means the
  * verification predicate drifted. */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-setsim-test")
  import spark.implicits._

  private def shingles(text: String): Set[String] = {
    val t = text.toLowerCase.split(" ")
    if (t.length < 3) Set.empty
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  test("prefix-filtered join equals brute-force all-pairs Jaccard") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(12)(i => s"w$i") // tiny vocab: maximal sharing
    val docs = (0L until 60L).map { id =>
      val base = Vector.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      // plant near-duplicates: every third doc mutates the previous one
      val text =
        if (id % 3 == 2 && id > 0) {
          val prev = Vector.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          prev.updated(0, vocab(rnd.nextInt(vocab.size))).mkString(" ")
        } else base.mkString(" ")
      (id, text)
    }
    // make genuine near-dup pairs deterministically: doc i+1000 = doc i with one word changed
    val mutated = docs.take(20).map { case (id, t) =>
      val w = t.split(" ")
      (id + 1000L, (w.init :+ "zz").mkString(" "))
    }
    val all = docs ++ mutated
    val tau = 600000L
    val df = all.toDF("doc_id", "text")
    val got = Dedup.setsimJoinOf(df, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val sets = all.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size.toLong; u = (sa | sb).size.toLong
      if i * 1000000L >= tau * u
    } yield (a, b, sa.size.toLong, sb.size.toLong, i * 1000000L / u)).toSet
    assert(want.nonEmpty, "fixture produced no qualifying pairs — test is vacuous")
    assert(got == want,
      s"prefix-filter divergence:\n missing ${want -- got}\n extra ${got -- want}")
  }

  test("threshold boundary: a pair at exactly tau is kept") {
    // sets with |i|/|u| exactly 0.6: i=3, u=5 → shingle engineering:
    // doc A tokens a b c d e  (shingles: abc bcd cde), doc B a b c d f
    // (abc bcd cdf) → i=2, u=4 = 0.5; craft instead with tau=500000
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val atTau = Dedup.setsimJoinOf(df, 500000L).collect()
    assert(atTau.length == 1 && atTau.head.getLong(4) == 500000L,
      s"boundary pair mishandled: ${atTau.toSeq}")
    val aboveTau = Dedup.setsimJoinOf(df, 500001L).collect()
    assert(aboveTau.isEmpty, s"pair below tau leaked: ${aboveTau.toSeq}")
  }
}
