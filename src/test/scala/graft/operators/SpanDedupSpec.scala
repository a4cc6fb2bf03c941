package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Repeated-span removal (the substring-granularity dedup family):
  * a shared run embedded in otherwise-distinct documents must be
  * detected in EVERY document carrying it, overlapping grams must merge
  * into one maximal island, and within-document repetition counts too
  * (it repeats corpus-wide by definition). */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-span-dedup-test")
  import spark.implicits._

  // 12 distinct tokens — 8-grams fully inside it exist at 5 start
  // positions; none of its grams cross into the flanking text below
  private val shared =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Dedup.spanDedupOf(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("a shared 12-token run in two distinct documents is one island in each") {
    val got = run(Seq(
      (1L, s"one two three four five six seven eight $shared nine ten eleven"),
      (2L, s"red orange yellow green blue purple pink brown $shared gray black white"),
      (3L, "totally unrelated words here with zero repetition anywhere present today")))
    // doc 1: 11 own tokens + 12 shared = 23 tokens, island covers the shared run
    assert(got(1L) == ((23L, 1L, 12L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((23L, 1L, 12L)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((10L, 0L, 0L)), s"doc 3: ${got(3L)}")
  }

  test("within-document repetition: the same 8-gram twice makes two islands") {
    val eight = "uno dos tres cuatro cinco seis siete ocho"
    val got = run(Seq(
      (7L, s"$eight nueve diez $eight"),
      (8L, "filler tokens that never repeat any window of eight equal anything else")))
    // tokens: 8 + 2 + 8 = 18; islands [1..8] and [11..18]
    assert(got(7L) == ((18L, 2L, 16L)), s"doc 7: ${got(7L)}")
    assert(got(8L)._2 == 0L)
  }

  test("adjacent spans merge; separated occurrences stay two islands") {
    // doc 1 carries runs X and Y back-to-back; doc 2 carries them
    // separated by two tokens. The grams INSIDE X and Y repeat; the
    // grams crossing the X|Y boundary exist only in doc 1 and do not.
    // Doc 1's two spans are exactly adjacent (start = prev end + 1) and
    // must merge into ONE island of 16; doc 2 keeps two islands.
    val x = "pan tilt zoom focus iris gain shutter lens"
    val y = "wheel axle gear chain brake pedal frame spoke"
    val got = run(Seq(
      (1L, s"$x $y"),
      (2L, s"$x mid gap $y")))
    assert(got(1L) == ((16L, 1L, 16L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((18L, 2L, 16L)), s"doc 2: ${got(2L)}")
  }

  test("documents shorter than the window never produce spans but keep their token count") {
    val got = run(Seq(
      (1L, "short doc"),
      (2L, "short doc")))  // verbatim dup, but < 8 tokens: no gram exists
    assert(got(1L) == ((2L, 0L, 0L)))
    assert(got(2L) == ((2L, 0L, 0L)))
  }

  test("gated query at sf0.001: planted boilerplate flags every 5th doc") {
    val got = Dedup.spanDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val planted = got.filter(_._1 % 5 == 0)
    assert(planted.nonEmpty)
    // every planted doc carries at least the boilerplate island (12 tokens)
    planted.foreach { case (d, (nSpans, toks)) =>
      assert(nSpans >= 1L && toks >= 12L, s"doc $d: ($nSpans, $toks)")
    }
  }
}
