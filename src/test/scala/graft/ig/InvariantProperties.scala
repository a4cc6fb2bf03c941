package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.functions.PyRound.pyround

/** Generated post row (top-level so Spark's encoder can codegen it). */
case class GenPost(creator_key: String, ordinal: Int, like_count: Long,
                   comment_count: Long, taken_at: Long, caption_text: String,
                   user_username: String, owner_username: String,
                   coauthor_usernames: Seq[String], is_paid_partnership: Boolean,
                   product_type: String, code: String)

/** Property-based invariants (SURVEY §5 item 3) over generated data,
  * exercising the real DataFrame pipelines on arbitrary inputs. */
object InvariantProperties extends Properties("graft-invariants") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = graft.Sessions.local("4", "graft-prop-test")
  import spark.implicits._

  private val clock = IgClock.golden

  // ---- generators --------------------------------------------------

  private val word = Gen.oneOf("travel", "vibes", "#ad", "#fitness", "@brandx",
    "@toolong_brand.name", "hello", "world", "#city", "love", "@ab", "x,y")
  private val caption = Gen.listOfN(8, word).map(_.mkString(" "))

  private def postsGen(nCreators: Int) = for {
    counts <- Gen.listOfN(nCreators, Gen.choose(1, 12))
    posts <- Gen.sequence[List[List[GenPost]], List[GenPost]](
      counts.zipWithIndex.map { case (n, ci) =>
        Gen.listOfN(n, for {
          l <- Gen.choose(0L, 5000L)
          c <- Gen.choose(0L, 500L)
          t <- Gen.choose(clock.cutoff(365), clock.nowEpoch)
          cap <- caption
          paid <- Gen.oneOf(true, false, false)
          pt <- Gen.oneOf("clips", "feed", "carousel_container")
        } yield GenPost(s"creator$ci", 0, l, c, t, cap, s"creator$ci",
          s"creator$ci", Nil, paid, pt, s"code$ci")).map(
          _.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"c${ci}_$i") })
      })
  } yield posts.flatten

  private def profilesGen(nCreators: Int) =
    Gen.sequence[List[(String, Long, Long, String, String, String)], (String, Long, Long, String, String, String)](
      (0 until nCreators).map { ci =>
        for {
          f <- Gen.choose(0L, 2000000L)
          fg <- Gen.choose(0L, 5000L)
          bio <- caption
        } yield (s"creator$ci", f, fg, bio, s"creator$ci", s"Creator $ci Name")
      }.toList)

  // ---- properties --------------------------------------------------

  property("pyround matches exact-binary half-even at scales 0-3") =
    Prop.forAll(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6)), Gen.choose(0, 3)) {
      (xs, scale) =>
        val got = xs.toDF("x").select(pyround(col("x"), scale)).as[Double].collect()
        val want = xs.map(d => new java.math.BigDecimal(d)
          .setScale(scale, java.math.RoundingMode.HALF_EVEN).doubleValue())
        got.toSeq == want
    }

  property("fake-follower: authenticity = max(0, 100-score); ladder consistent") =
    Prop.forAll(Gen.choose(1, 4).flatMap(n => Gen.zip(postsGen(n), profilesGen(n)))) {
      case (ps, prs) =>
        val posts = ps.toDF()
        val profiles = prs.toDF("creator_key", "follower_count", "following_count",
          "biography", "username", "full_name")
        ProfileAnalysis.fakeFollowers(posts, profiles).collect().forall { r =>
          val score = r.getAs[Long]("fake_follower_score")
          val auth = r.getAs[Long]("authenticity_score")
          val q = r.getAs[String]("engagement_quality")
          auth == math.max(0L, 100L - score) &&
            (if (score > 50) q == "Poor" else if (score > 25) q == "Moderate" else q == "Good") &&
            r.getSeq[String](r.fieldIndex("suspicious_indicators")).length <= 3
        }
    }

  property("hashtags/mentions: top-k bounded, counts positive, window respected") =
    Prop.forAll(Gen.choose(1, 3).flatMap(postsGen)) { ps =>
      val posts = ps.toDF()
      LocationHashtags.hashtagsMentions(posts, clock).collect().forall { r =>
        val h = r.getAs[Map[String, Long]]("hashtags_last_90_days")
        val m = r.getAs[Map[String, Long]]("mentions_last_90_days")
        h.size <= 10 && m.size <= 10 &&
          h.values.forall(_ > 0) && m.values.forall(_ > 0) &&
          m.keys.forall(_.length >= 3) &&
          r.getAs[Long]("posts_analyzed_for_hashtags") <=
            ps.count(_.creator_key == r.getAs[String]("creator_key"))
      }
    }

  property("resume anti-join is idempotent") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 50)), Gen.listOf(Gen.choose(0, 50))) {
      (input, done) =>
        val in = input.toDF("url")
        val dn = done.toDF("url")
        val once = in.join(dn, Seq("url"), "left_anti")
        val twice = once.join(dn, Seq("url"), "left_anti")
        once.collect().map(_.getInt(0)).sorted.toSeq ==
          twice.collect().map(_.getInt(0)).sorted.toSeq
    }

  property("niche distribution entries are >= 2% and <= 100%") =
    Prop.forAll(Gen.choose(1, 4).flatMap(profilesGen)) { prs =>
      val profiles = prs.toDF("creator_key", "follower_count", "following_count",
        "biography", "username", "full_name")
      ProfileAnalysis.niche(profiles)
        .select(col("niche_data.distribution")).collect().forall { r =>
          r.getAs[Map[String, Double]](0).values.forall(v => v >= 2.0 && v <= 100.0)
        }
    }

  private val edgeCaption = Gen.oneOf(caption, Gen.const(""), Gen.const("#ad"),
    Gen.const("@x @ab"), Gen.const("émoji ünïcode #perché @caffè.it"))

  private def edgePostsGen(nCreators: Int) = for {
    counts <- Gen.listOfN(nCreators, Gen.choose(0, 6))
    posts <- Gen.sequence[List[List[GenPost]], List[GenPost]](
      counts.zipWithIndex.map { case (n, ci) =>
        Gen.listOfN(n, for {
          l <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, 5000L))
          t <- Gen.oneOf(Gen.const(0L), Gen.choose(clock.cutoff(400), clock.nowEpoch))
          cap <- edgeCaption
          paid <- Gen.oneOf(true, false)
          owner <- Gen.oneOf(s"creator$ci", "someoneelse", "")
        } yield GenPost(s"creator$ci", 0, l, 0L, t, cap, s"creator$ci",
          owner, Seq("coauth1"), paid, "clips", "c")).map(
          _.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"c${ci}_$i") })
      })
  } yield posts.flatten

  property("full report assembly never throws on edge-heavy data") =
    Prop.forAll(Gen.choose(1, 3).flatMap(n => Gen.zip(edgePostsGen(n), profilesGen(n)))) {
      case (ps, prs) =>
        val posts = ps.toDF()
          .withColumn("pk", col("code")).withColumn("id", col("code"))
          .withColumn("is_video", lit(true)).withColumn("media_type", lit(1L))
          .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
          .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
            "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
            "username:string,is_pending:boolean>>)"))
          .withColumn("location",
            expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)"))
        val profiles = prs.toDF("creator_key", "follower_count", "following_count",
          "biography", "username", "full_name")
          .withColumn("media_count", lit(null).cast("long"))
          .withColumn("category", lit(null).cast("string"))
          .withColumn("is_private", lit(false))
          .withColumn("is_verified", lit(false))
          .withColumn("is_business", lit(false))
          .withColumn("external_url", lit(null).cast("string"))
          .withColumn("pronouns", lit(null).cast("array<string>"))
          .withColumn("bio_links",
            expr("cast(null as array<struct<title:string,url:string,link_type:string>>)"))
        val rows = Report.assemble(profiles, posts, clock).collect()
        rows.length == prs.length
    }

  property("top-6 posts: bounded size, ER formula, desc interaction order") =
    Prop.forAll(Gen.choose(1, 3).flatMap(n => Gen.zip(postsGen(n), profilesGen(n)))) {
      case (ps, prs) =>
        val posts = ps.toDF()
        val profiles = prs.toDF("creator_key", "follower_count", "following_count",
          "biography", "username", "full_name")
        Engagement.topPosts(posts, profiles, clock).collect().forall { r =>
          val top = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("top_6_posts"))
          val scores = top.map(_.getAs[Long]("interaction_score"))
          top.length <= 6 && scores == scores.sortBy(-_)
        }
    }
}
