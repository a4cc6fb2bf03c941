package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pigeonhole completeness of the hamming ≤ k band split: flipping at
  * most k bits of a signature cannot touch all k+1 bands, so every
  * within-distance pair MUST collide on at least one full band — the
  * property that makes the banded equi-join a complete candidate
  * generator (no missed pairs, only false positives to filter). */
class SimHashBandSpec extends AnyFunSuite {

  private def bandKeys(sig: Long, bits: Int, k: Int): Seq[Long] =
    Dedup.hammingBands(bits, k).map { case (lo, w) => (sig >> lo) & ((1L << w) - 1) }

  test("band split covers the signature exactly (disjoint, complete)") {
    for (bits <- Seq(16, 32, 60); k <- Seq(1, 2, 3)) {
      val bands = Dedup.hammingBands(bits, k)
      assert(bands.map(_._2).sum == bits, s"bits=$bits k=$k widths")
      assert(bands.map(_._2).max - bands.map(_._2).min <= 1, "near-equal widths")
      val covered = bands.flatMap { case (lo, w) => lo until (lo + w) }
      assert(covered == (0 until bits), s"bits=$bits k=$k coverage")
    }
  }

  test("any pair within hamming k collides on at least one band (1000 trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val bits = 60; val k = 2
      val sig = rnd.nextLong() & ((1L << bits) - 1)
      val flips = rnd.nextInt(k + 1) // 0..k bit flips
      val flipped = (1 to flips).foldLeft(sig)((s, _) => s ^ (1L << rnd.nextInt(bits)))
      // (re-flipping the same bit only LOWERS the distance — still ≤ k)
      val ka = bandKeys(sig, bits, k)
      val kb = bandKeys(flipped, bits, k)
      assert(ka.zip(kb).exists { case (x, y) => x == y },
        s"no band collision for sig=$sig flipped=$flipped")
    }
  }

  test("beyond-distance pairs are filtered, not emitted (exact post-filter semantics)") {
    // a synthetic pair at distance k+1 that still shares a band must be
    // removed by the hamming filter — i.e. band collision is necessary,
    // never sufficient
    val bits = 60; val k = 2
    val sig = 0L
    val far = (0 until (k + 1)).foldLeft(sig)((s, i) => s ^ (1L << i)) // 3 flips in band 0
    assert(java.lang.Long.bitCount(sig ^ far) == k + 1)
    assert(bandKeys(sig, bits, k).drop(1) == bandKeys(far, bits, k).drop(1),
      "far pair still collides on untouched bands — the join WOULD pair it")
    // the query's final filter is `hamming <= k`, which drops it
    assert(java.lang.Long.bitCount(sig ^ far) > k)
  }
}
