package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for calculate_engagement_metrics' discrete outputs
  * (analyze_insta_enhanced.py:390-538): posting-frequency ladder,
  * split-half trend, best-posting-time mode tie-break and viral count,
  * ported imperatively. Label comparisons carry a margin guard: when the
  * ported decision value sits within 1e-6 of a ladder boundary the case
  * is skipped (float-fold vs exact-mean ulp differences are legitimate). */
object EngagementDifferentialSpec extends Properties("engagement-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-eng-diff")
  import spark.implicits._

  private val clock = IgClock.golden

  private case class Want(
      totalPosts: Long, viral: Long, freq: String, trend: String, best: String)

  /** Imperative port of the discrete fields (test oracle only). Returns
    * None when any decision value is within eps of a boundary. */
  private def reference(posts: Seq[GenPost], followers: Long): Option[Want] = {
    val eps = 1e-6
    if (posts.isEmpty || followers == 0) return None // default path (covered elsewhere)
    val scores = posts.map(p =>
      (p.like_count + p.comment_count * 2).toDouble / math.max(followers, 1L) * 100.0)
    val mean = scores.sum / scores.length
    if (scores.exists(s => math.abs(s - 2 * mean) < eps)) return None
    val viral = scores.count(_ > 2 * mean).toLong

    val ts = posts.map(_.taken_at).filter(_ != 0)
    val freq =
      if (ts.length <= 1) "Unknown"
      else {
        val gap = (ts.max - ts.min).toDouble / (ts.length - 1) / 86400.0
        if (Seq(0.5, 1.0, 2.0, 7.0, 14.0).exists(b => math.abs(gap - b) < eps)) return None
        if (gap < 0.5) "Multiple times daily" else if (gap < 1) "Daily"
        else if (gap < 2) "Every other day" else if (gap < 7) "Weekly"
        else if (gap < 14) "Bi-weekly" else "Monthly or less"
      }

    val trend =
      if (posts.length < 10) "Stable"
      else {
        val half = posts.length / 2
        val recent = posts.take(half).map(_.like_count.toDouble)
        val older = posts.drop(half).map(_.like_count.toDouble)
        val (ra, oa) = (recent.sum / recent.length, older.sum / older.length)
        if (oa == 0) return None
        val ratio = ra / oa
        if (math.abs(ratio - 1.15) < eps || math.abs(ratio - 0.85) < eps) return None
        if (ratio > 1.15) "Growing" else if (ratio < 0.85) "Declining" else "Stable"
      }

    val best =
      if (ts.isEmpty) "Unknown"
      else {
        val hours = posts.filter(_.taken_at != 0).map(p =>
          java.time.Instant.ofEpochSecond(p.taken_at)
            .atZone(java.time.ZoneId.of("Asia/Kathmandu")).getHour)
        // Counter.most_common ties → first insertion (first occurrence)
        val counts = scala.collection.mutable.LinkedHashMap[Int, Int]()
        hours.foreach(h => counts(h) = counts.getOrElse(h, 0) + 1)
        val h = counts.toSeq.sortBy(-_._2).head._1
        if (h >= 6 && h <= 11) "Morning (6-11 AM)"
        else if (h >= 12 && h <= 17) "Afternoon (12-5 PM)"
        else if (h >= 18 && h <= 22) "Evening (6-10 PM)"
        else "Night (11 PM-5 AM)"
      }

    Some(Want(posts.length.toLong, viral, freq, trend, best))
  }

  private def postsGen = Gen.choose(1, 16).flatMap(n =>
    Gen.listOfN(n, for {
      l <- Gen.choose(0L, 900L)
      c <- Gen.choose(0L, 40L)
      t <- Gen.frequency(
        5 -> Gen.choose(clock.cutoff(120), clock.nowEpoch),
        1 -> Gen.const(0L))
    } yield GenPost("c0", 0, l, c, t, "", "c0", "c0", Nil, false, "feed", "k"))
      .map(_.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"k$i") }))

  property("discrete engagement fields equal the imperative reference port") =
    Prop.forAll(Gen.zip(postsGen, Gen.oneOf(900L, 25000L))) { case (ps, followers) =>
      reference(ps, followers) match {
        case None => Prop.passed
        case Some(want) =>
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
          val r = Engagement.metrics(posts, profiles, clock).collect()(0)
          val have = Want(
            r.getAs[Long]("total_posts_analyzed"),
            r.getAs[Long]("viral_posts_count"),
            r.getAs[String]("post_frequency"),
            r.getAs[String]("engagement_trend"),
            r.getAs[String]("best_posting_time"))
          val ok = have == want
          if (!ok) println(s"MISMATCH f=$followers:\n want=$want\n have=$have\n posts=${ps.map(p => (p.ordinal, p.like_count, p.comment_count, p.taken_at))}")
          Prop.propBoolean(ok)
      }
    }
}
