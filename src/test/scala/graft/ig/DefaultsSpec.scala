package graft.ig

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Default-path semantics the shipped goldens never exercise:
  * follower_count == 0 (calculate_engagement_metrics :408-411 and
  * calculate_top_post_er :1496-1498 return their defaults) and a creator
  * with zero posts. Expected values are the reference's default dicts. */
class DefaultsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-defaults-test")
  import spark.implicits._

  private val clock = IgClock.golden

  private def profilesDf = Seq(
    // (creator, username, full_name, bio, followers, following)
    ("zerof", "zerof", "Zero Fan", "fitness coach she/her", 0L, 10L),
    ("noposts", "noposts", "No Posts", "", 1000L, 10L)).toDF(
    "creator_key", "username", "full_name", "biography", "follower_count", "following_count")
    .withColumn("media_count", lit(null).cast("long"))
    .withColumn("category", lit(null).cast("string"))
    .withColumn("is_private", lit(false))
    .withColumn("is_verified", lit(false))
    .withColumn("is_business", lit(false))
    .withColumn("external_url", lit(null).cast("string"))
    .withColumn("pronouns", lit(null).cast("array<string>"))
    .withColumn("bio_links",
      expr("cast(null as array<struct<title:string,url:string,link_type:string>>)"))

  private def postsDf = Seq(
    GenPost("zerof", 0, 50L, 5L, clock.cutoff(10), "great #fitness day @brandpal", "zerof", "zerof", Nil, false, "feed", "k1"),
    GenPost("zerof", 1, 70L, 7L, clock.cutoff(20), "more #fitness", "zerof", "zerof", Nil, false, "clips", "k2")).toDF()
    .withColumn("pk", col("code")).withColumn("id", col("code"))
    .withColumn("is_video", col("product_type") === "clips")
    .withColumn("media_type", lit(1L))
    .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
    .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
      "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
      "username:string,is_pending:boolean>>)"))
    .withColumn("location", expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)"))

  test("zero-follower and zero-post creators get the reference default blocks") {
    val report = Report.assemble(profilesDf, postsDf, clock)
    val rows = report.collect().map(r => r.getAs[String]("username") -> r).toMap
    assert(rows.keySet == Set("zerof", "noposts"))

    rows.values.foreach { r =>
      val em = r.getAs[Row]("engagement_metrics")
      assert(em.getAs[Long]("avg_likes") == 0L)
      assert(em.getAs[Double]("engagement_rate") == 0.0)
      assert(em.getAs[String]("post_frequency") == "Unknown")
      assert(em.getAs[String]("engagement_trend") == "Stable")
      assert(em.getAs[String]("best_posting_time") == "Unknown")
      assert(em.getAs[Long]("total_posts_analyzed") == 0L)
      assert(em.getAs[Map[String, Double]]("latest_posts_er").isEmpty)
      assert(r.getAs[Long]("total_posts_last_3_months") == 0L ||
        r.getAs[String]("username") == "zerof") // zerof HAS recent posts…
    }
    // …but calculate_top_post_er still bails on followers==0 (:1496-1498)
    val zerof = rows("zerof")
    assert(zerof.getAs[Long]("total_posts_last_3_months") == 0L)
    assert(zerof.getSeq[Row](zerof.fieldIndex("top_6_posts")).isEmpty)
    assert(zerof.getAs[Double]("average_engagement_rate") == 0.0)
    // fake-follower default block (edges empty or followers==0, :262-263)
    Seq("zerof", "noposts").foreach { k =>
      val f = rows(k).getAs[Row]("fake_follower_analysis")
      assert(f.getAs[Long]("fake_follower_score") == 0L, k)
      assert(f.getAs[Long]("authenticity_score") == 100L, k)
      assert(f.getAs[String]("engagement_quality") == "Good", k)
    }
    // extraction still runs on the profile alone
    assert(rows("zerof").getAs[String]("gender") == "Female") // she/her pronoun text
    assert(rows("zerof").getAs[String]("creator_size") == "Unknown") // 0 followers
    assert(rows("noposts").getAs[String]("creator_size") == "Nano-Influencer")
    // hashtags block: zerof has recent posts (posts_analyzed counts them
    // regardless of followers, :1565-1580); noposts has none
    assert(rows("zerof").getAs[Long]("posts_analyzed_for_hashtags") == 2L)
    assert(rows("noposts").getAs[Long]("posts_analyzed_for_hashtags") == 0L)
  }
}
