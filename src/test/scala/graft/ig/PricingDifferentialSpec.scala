package graft.ig

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for extract_creator_pricing
  * (analyze_insta_enhanced.py:837-960): imperative port as oracle — the
  * UGC-keyword cascade over profile fields then captions (incl. the
  * `#nospace` caption forms), the <1000-follower reclassification, the
  * tier ladders, and the Python-rounded pricing matrix. */
object PricingDifferentialSpec extends Properties("pricing-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = graft.Sessions.local("4", "graft-pricing-diff")
  import spark.implicits._

  private val ugcKeywords = Seq("ugc", "ugccreator", "ugc creator",
    "user generated content", "user-generated content", "content creator",
    "brand creator", "ugc content", "product creator")

  private def pyround(x: Double): Long =
    new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_EVEN).longValue()

  /** Direct port (test oracle only). Returns (type, tier, t15..t5plus). */
  private def reference(followers: Long, username: String, fullName: String,
                        bio: String, captions: Seq[String])
      : (String, String, Seq[Long]) = {
    val texts = Seq(fullName, username, bio).map(t => Option(t).getOrElse("").toLowerCase)
    var creatorType =
      if (texts.exists(t => ugcKeywords.exists(t.contains))) "UGC Creator"
      else "Social Media Influencer"
    if (creatorType != "UGC Creator") {
      val capHit = captions.map(_.toLowerCase).exists(c =>
        ugcKeywords.exists(k => c.contains(k) || c.contains("#" + k.replace(" ", ""))))
      if (capHit) creatorType = "UGC Creator"
    }
    var tier = "Unknown"
    if (creatorType == "Social Media Influencer" && followers < 1000) {
      creatorType = "UGC Creator"; tier = "Beginner"
    } else if (creatorType == "UGC Creator") {
      tier = if (followers < 1000) "Beginner" else "Experienced"
    } else {
      tier = if (followers < 10000) "1K-10K"
        else if (followers < 50000) "10K-50K"
        else if (followers < 500000) "50K-500K"
        else "500K-1M+"
    }
    val base: Long = (creatorType, tier) match {
      case ("UGC Creator", "Beginner")                  => 100
      case ("UGC Creator", "Experienced")               => 300
      case ("Social Media Influencer", "1K-10K")        => 150
      case ("Social Media Influencer", "10K-50K")       => 500
      case ("Social Media Influencer", "50K-500K")      => 2500
      case ("Social Media Influencer", "500K-1M+")      => 4000
      case other => sys.error(s"unreachable $other")
    }
    val prices = Seq(pyround(0.4 * base), pyround(0.6 * base), base,
      pyround(1.333 * base), pyround(2.0 * base))
    (creatorType, tier, prices)
  }

  private val nameGen = Gen.oneOf("Jane Doe", "UGC with Jane", "jane | content creator",
    "Brand Creator Co", "plain name", "")
  private val userGen = Gen.oneOf("janedoe", "jane.ugc", "ugcjane", "plainuser")
  private val bioGen = Gen.oneOf("skincare reviews", "I make user generated content",
    "product creator for hire", "just vibes", "", "ugc content daily")
  private val capsGen = Gen.choose(0, 3).flatMap(k => Gen.listOfN(k, Gen.oneOf(
    "new post #fyp", "my #ugccontent drop", "loved this #ad", "ugc creator life",
    "nothing here", "#usergeneratedcontent example")))
  private val followersGen = Gen.oneOf(0L, 500L, 999L, 1000L, 9999L, 10000L,
    49999L, 50000L, 499999L, 500000L, 2000000L)

  property("spark pricing equals the imperative reference port") =
    Prop.forAll(followersGen, userGen, nameGen, bioGen, capsGen) { (f, un, fn, bio, caps) =>
      val profiles = Seq(("c0", un, fn, bio, f))
        .toDF("creator_key", "username", "full_name", "biography", "follower_count")
      val posts = (if (caps.isEmpty) Seq((("c0"), None: Option[String]))
        else caps.map(c => ("c0", Some(c))))
        .toDF("creator_key", "caption_text")
      val withFlag = profiles.join(Extraction.ugcCaptionFlag(posts), Seq("creator_key"), "left")
      val r = Extraction.pricing(withFlag)
        .select("creator_type", "tier", "creator_pricing_metrics.*").collect()(0)
      val have = (r.getAs[String]("creator_type"), r.getAs[String]("tier"),
        Seq(r.getAs[Long]("time_15_seconds"), r.getAs[Long]("time_30_seconds"),
          r.getAs[Long]("time_60_seconds"), r.getAs[Long]("time_1_to_5_minutes"),
          r.getAs[Long]("time_greater_than_5_minutes")))
      val want = reference(f, un, fn, bio, caps)
      val ok = have == want
      if (!ok) println(s"MISMATCH f=$f un=[$un] fn=[$fn] bio=[$bio] caps=$caps:\n want=$want\n have=$have")
      ok
    }
}
