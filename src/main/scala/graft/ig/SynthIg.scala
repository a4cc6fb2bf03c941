package graft.ig

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** IG-shaped synthesis from the star schema — the scale harness for the
  * flagship pipeline. Maps `customer` → profiles and `orders` → posts
  * (one post per order, ordinal = recency rank), then runs the ENTIRE
  * Report.assemble DAG: at sf0.1 that is ~150 k creators / 1.5 M posts
  * through every analysis block (windows, top-k, broadcast keyword join,
  * ten creator-key equi-joins, global sort). This is the query that
  * answers "does the 9-creator pipeline survive 5 orders of magnitude
  * more keys" — registered rows-only (no SQL oracle: the full document
  * assembly is not expressible in ANSI SQL; correctness of every block
  * is oracle- or golden-gated separately).
  */
object SynthIg {

  /** Frozen clock inside the orders date range (1992-1998). */
  val synthClock: IgClock = IgClock(
    java.time.ZonedDateTime.of(1998, 8, 1, 12, 0, 0, 0,
      java.time.ZoneId.of("UTC")).toEpochSecond, "UTC")

  def syntheticProfiles(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      concat(lit("c"), col("c_custkey")).as("creator_key"),
      concat(lit("c"), col("c_custkey")).as("username"),
      col("c_name").as("full_name"),
      concat(lit("Creator of "), lower(col("c_mktsegment")),
        lit(" content. Contact: c"), col("c_custkey"),
        lit("@example.com #"), lower(col("c_mktsegment"))).as("biography"),
      (abs(col("c_acctbal")) * 100).cast("long").as("follower_count"),
      (col("c_nationkey") * 37 % 5000).cast("long").as("following_count"),
      lit(null).cast("long").as("media_count"),
      col("c_mktsegment").as("category"),
      lit(false).as("is_private"),
      (col("c_custkey") % 97 === 0).as("is_verified"),
      (col("c_custkey") % 13 === 0).as("is_business"),
      lit(null).cast("string").as("external_url"),
      lit(null).cast("array<string>").as("pronouns"),
      expr("cast(null as array<struct<title:string,url:string,link_type:string>>)")
        .as("bio_links"))

  def syntheticPosts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("ordinal", row_number().over(w) - 1)
      .select(
        concat(lit("c"), col("o_custkey")).as("creator_key"),
        col("ordinal"),
        col("o_orderkey").cast("string").as("pk"),
        col("o_orderkey").cast("string").as("id"),
        concat(lit("ord"), col("o_orderkey")).as("code"),
        unix_timestamp(col("o_orderdate")).as("taken_at"),
        (col("o_totalprice") / 10).cast("long").as("like_count"),
        (col("o_orderkey") % 50).cast("long").as("comment_count"),
        concat(lit("Order "), col("o_orderstatus"), lit(" #"),
          lower(regexp_replace(col("o_orderpriority"), "[^A-Za-z]", "")),
          lit(" @brand"), col("o_orderkey") % 7,
          when(col("o_orderkey") % 11 === 0, lit(" #ad")).otherwise(lit(""))).as("caption_text"),
        (col("o_orderpriority") === "1-URGENT").as("is_paid_partnership"),
        (col("o_orderkey") % 3 === 0).as("is_video"),
        when(col("o_orderkey") % 3 === 0, lit("clips")).otherwise(lit("feed"))
          .as("product_type"),
        lit(1L).as("media_type"),
        expr("cast(array() as array<string>)").as("sponsor_usernames"),
        expr("cast(null as array<struct<is_pending:boolean," +
          "sponsor:struct<pk:string,username:string,id:string,full_name:string," +
          "profile_pic_url:string,is_unpublished:boolean>," +
          "username:string>>)").as("sponsor_tags"),
        expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)")
          .as("location"),
        concat(lit("c"), col("o_custkey")).as("user_username"),
        when(col("o_orderkey") % 29 === 0, concat(lit("brand"), col("o_orderkey") % 7))
          .otherwise(concat(lit("c"), col("o_custkey"))).as("owner_username"),
        expr("cast(array() as array<string>)").as("coauthor_usernames"))
  }

  /** The full flagship DAG over synthesized data; driver rows-check. */
  def igReportSynth(spark: SparkSession, dir: String): DataFrame =
    Report.assemble(syntheticProfiles(spark, dir), syntheticPosts(spark, dir), synthClock)
      .select("username", "follower_count", "creator_size", "gender",
        "ig_account_type", "creator_type", "tier",
        "total_posts_last_3_months", "average_engagement_rate",
        "collaboration_status", "total_collaborations",
        "posts_analyzed_for_hashtags")

  /** SQL-expressible core of the synthesized report — the ladder/window
    * fields whose derivation from customer/orders IS plain SQL, gated
    * hash-exact against DuckDB (the full document stays rows-only in
    * [[igReportSynth]], which runs the entire 10-join assembly).
    *
    * Built from the SAME operator blocks the full report uses
    * (Extraction.pricing/creatorSize ladders, the topPosts 90-day window,
    * the hashtag-window count) over pruned inputs: Spark cannot eliminate
    * the report's unused left joins, so benching the full DAG for a
    * 7-column projection would measure 31 dead columns. */
  def igReportSynthCore(spark: SparkSession, dir: String): DataFrame = {
    val profiles = syntheticProfiles(spark, dir)
    val posts = syntheticPosts(spark, dir)
      .select("creator_key", "ordinal", "taken_at", "like_count",
        "comment_count", "code", "caption_text")
    val enriched = Extraction.pricing(
      profiles.join(Extraction.ugcCaptionFlag(posts), Seq("creator_key"), "left"))
      .withColumn("creator_size", Extraction.creatorSize(col("follower_count")))
    val top = Engagement.topPosts(posts, profiles, synthClock)
      .select("creator_key", "total_posts_last_3_months")
    val ht = LocationHashtags.hashtagsMentions(posts, synthClock)
      .select("creator_key", "posts_analyzed_for_hashtags")
    enriched
      .join(top, Seq("creator_key"), "left")
      .join(ht, Seq("creator_key"), "left")
      .select(col("username"), col("follower_count"), col("creator_size"),
        col("creator_type"), col("tier"),
        coalesce(col("total_posts_last_3_months"), lit(0L))
          .as("total_posts_last_3_months"),
        coalesce(col("posts_analyzed_for_hashtags"), lit(0L))
          .as("posts_analyzed_for_hashtags"))
      .orderBy("username")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ig_report_synth" -> igReportSynth _,
    "ig_report_synth_core" -> igReportSynthCore _)

  /** The full document is not ANSI-SQL-expressible (rows-only check);
    * the core projection re-derives the ladders and 90-day window counts
    * from the same star tables in DuckDB. No profile/caption in the
    * synthesis contains a UGC keyword, so creator_type reduces to the
    * follower threshold (Extraction.pricing :850-870). */
  val oracles: Map[String, String] = Map(
    "ig_report_synth_core" -> s"""
      WITH prof AS (
        SELECT 'c' || c_custkey AS username,
               CAST(trunc(abs(c_acctbal) * 100) AS BIGINT) AS follower_count
        FROM customer
      ),
      cnt AS (
        SELECT 'c' || o_custkey AS username,
               CAST(count(*) AS BIGINT) AS n_recent
        FROM orders
        WHERE epoch(o_orderdate) >= ${synthClock.cutoff(90)}
        GROUP BY 1
      )
      SELECT p.username,
             p.follower_count,
             CASE WHEN p.follower_count = 0 THEN 'Unknown'
                  WHEN p.follower_count < 5000 THEN 'Nano-Influencer'
                  WHEN p.follower_count < 50000 THEN 'Micro-Influencer'
                  WHEN p.follower_count < 500000 THEN 'Mid-Tier Influencer'
                  WHEN p.follower_count < 1000000 THEN 'Macro-Influencer'
                  ELSE 'Mega-Influencer' END AS creator_size,
             CASE WHEN p.follower_count < 1000 THEN 'UGC Creator'
                  ELSE 'Social Media Influencer' END AS creator_type,
             CASE WHEN p.follower_count < 1000 THEN 'Beginner'
                  WHEN p.follower_count < 10000 THEN '1K-10K'
                  WHEN p.follower_count < 50000 THEN '10K-50K'
                  WHEN p.follower_count < 500000 THEN '50K-500K'
                  ELSE '500K-1M+' END AS tier,
             CASE WHEN p.follower_count > 0 THEN coalesce(c.n_recent, 0) ELSE 0 END
               AS total_posts_last_3_months,
             coalesce(c.n_recent, 0) AS posts_analyzed_for_hashtags
      FROM prof p LEFT JOIN cnt c USING (username)
      ORDER BY username""")
}
