package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for detect_fake_followers
  * (analyze_insta_enhanced.py:244-310): imperative port as oracle,
  * covering the first-20/full-count division quirk and the indicator
  * thresholds. */
object FakeFollowerDifferentialSpec extends Properties("fakefollower-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = graft.Sessions.local("4", "graft-fake-diff")
  import spark.implicits._

  /** Direct port (test oracle only): (score, indicators, authenticity, quality). */
  private def reference(posts: Seq[GenPost], followers: Long, following: Long)
      : (Long, Seq[String], Long, String) = {
    if (posts.isEmpty || followers == 0) return (0L, Nil, 100L, "Good")
    val first20 = posts.take(20)
    val tl = first20.map(_.like_count).sum
    val tc = first20.map(_.comment_count).sum
    val n = posts.size // full count, not first-20 (:278) — the quirk
    val avgL = tl.toDouble / n
    val avgC = tc.toDouble / n
    val er = (tl + tc).toDouble / n / followers * 100.0
    var score = 0L
    val ind = scala.collection.mutable.ArrayBuffer[String]()
    if (er < 0.5) { ind += "Very low engagement rate"; score += 30 }
    if (followers > 10000 && following < 100 && er < 1) {
      ind += "High follower count with very low following and engagement"; score += 25
    }
    if (avgL > 100 && avgC < avgL * 0.01) {
      ind += "Disproportionately low comment rate"; score += 20
    }
    val quality = if (score > 50) "Poor" else if (score > 25) "Moderate" else "Good"
    (score, ind.toSeq, math.max(0L, 100L - score), quality)
  }

  private def postsGen = Gen.choose(0, 30).flatMap(n =>
    Gen.listOfN(n, for {
      l <- Gen.oneOf(Gen.choose(0L, 50L), Gen.choose(100L, 20000L))
      c <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, 200L))
    } yield GenPost("c0", 0, l, c, 1700000000L, "", "c0", "c0", Nil, false, "feed", "k"))
      .map(_.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"k$i") }))

  property("spark scoring equals the imperative reference port") =
    Prop.forAll(Gen.zip(postsGen,
      Gen.oneOf(0L, 500L, 20000L, 1000000L), Gen.oneOf(5L, 99L, 5000L))) {
      case (ps, followers, following) =>
        val profiles = Seq(("c0", followers, following))
          .toDF("creator_key", "follower_count", "following_count")
        val posts = ps.toDF()
        val r = ProfileAnalysis.fakeFollowers(posts, profiles).collect()(0)
        val want = reference(ps, followers, following)
        val have = (r.getAs[Long]("fake_follower_score"),
          r.getSeq[String](r.fieldIndex("suspicious_indicators")),
          r.getAs[Long]("authenticity_score"),
          r.getAs[String]("engagement_quality"))
        val ok = have == want
        if (!ok) println(s"MISMATCH f=$followers fg=$following n=${ps.size}:\n want=$want\n have=$have")
        ok
    }
}
