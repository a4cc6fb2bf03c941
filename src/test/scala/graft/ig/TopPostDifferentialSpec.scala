package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for calculate_top_post_er
  * (analyze_insta_enhanced.py:1489-1543): imperative port as oracle over
  * generated posts — verifies the 90-day filter, interaction-score
  * ordering (stable on ties), top-6 cut and the ER arithmetic. */
object TopPostDifferentialSpec extends Properties("toppost-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-toppost-diff")
  import spark.implicits._

  private val clock = IgClock.golden
  private val cutoff = clock.cutoff(90)

  private def pyround2(x: Double): Double =
    new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** Direct port (test oracle only). Returns (total, top codes+scores, avg_er). */
  private def reference(posts: Seq[GenPost], followers: Long)
      : (Long, Seq[(String, Long, Double)], Double) = {
    if (followers == 0) return (0L, Nil, 0.0)
    val recent = posts.filter(p => p.taken_at >= cutoff) // get('taken_at', 0)
    val scored = recent.map { p =>
      val score = p.like_count + p.comment_count * 5
      val er = pyround2(score.toDouble / followers * 100.0)
      (p, score, er)
    }
    // sorted(key=interaction_score, reverse=True) is a stable sort
    val top = scored.sortBy(-_._2).take(6)
    val avg = if (top.isEmpty) 0.0
      else pyround2(top.map(_._3).foldLeft(0.0)(_ + _) / top.length)
    (recent.size.toLong, top.map(t => (t._1.code, t._2, t._3)), avg)
  }

  private def postsGen(ci: Int) = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, for {
      l <- Gen.oneOf(Gen.choose(0L, 50L), Gen.choose(0L, 5000L)) // ties likely
      c <- Gen.choose(0L, 10L)
      t <- Gen.oneOf(Gen.const(0L),
        Gen.choose(clock.cutoff(200), clock.nowEpoch))
    } yield GenPost(s"c$ci", 0, l, c, t, "cap", s"c$ci", s"c$ci", Nil,
      false, "feed", "k")).map(
      _.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"k$i") }))

  property("spark top-6 equals the imperative reference port") =
    Prop.forAll(Gen.zip(postsGen(0), Gen.oneOf(0L, 1L, 1000L, 250000L))) {
      case (ps, followers) =>
        if (ps.isEmpty) Prop.passed else Prop.propBoolean {
          val posts = ps.toDF()
            .withColumn("pk", col("code")).withColumn("id", col("code"))
            .withColumn("is_video", lit(false)).withColumn("media_type", lit(1L))
            .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
            .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
              "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
              "username:string,is_pending:boolean>>)"))
            .withColumn("location",
              expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)"))
          val profiles = Seq(("c0", followers)).toDF("creator_key", "follower_count")
          val got = Engagement.topPosts(posts, profiles, clock).collect()
          val want = reference(ps, followers)
          if (followers == 0 || want._1 == 0) {
            // default path: metrics row absent (assemble supplies defaults)
            got.isEmpty || (got(0).getAs[Long]("total_posts_last_3_months") == want._1)
          } else {
            val r = got(0)
            val topRows = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("top_6_posts"))
              .map(p => (p.getAs[String]("post_code"),
                p.getAs[Long]("interaction_score"),
                p.getAs[Double]("engagement_rate")))
            val ok = r.getAs[Long]("total_posts_last_3_months") == want._1 &&
              topRows == want._2 &&
              math.abs(r.getAs[Double]("average_engagement_rate") - want._3) <= 0.011
            if (!ok) println(s"MISMATCH f=$followers:\n want=$want\n have=(${r.getAs[Long]("total_posts_last_3_months")}, $topRows, ${r.getAs[Double]("average_engagement_rate")})")
            ok
          }
        }
    }
}
