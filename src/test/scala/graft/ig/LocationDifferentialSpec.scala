package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for analyze_location_data
  * (analyze_insta_enhanced.py:92-242): location-candidate insertion
  * order, count-after-dedup most-visited, location-hashtag patterns,
  * posting-hour histogram and the timezone-estimate ladder (with its
  * fall-through gaps at fractional averages), ported imperatively. */
object LocationDifferentialSpec extends Properties("location-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-loc-diff")
  import spark.implicits._

  private val clock = IgClock.golden
  private val cityRe = "\\b([A-Z][a-z]{2,}(?:\\s+[A-Z][a-z]{2,})?)\\b".r
  private val tagRe = "#(\\w+)".r
  private val locPatterns = Seq(
    ".*city$", ".*town$", ".*beach$", ".*park$", ".*street$",
    ".*travel$", ".*trip$", ".*vacation$", ".*holiday$",
    "^nyc$", "^la$", "^sf$", "^london$", "^paris$", "^tokyo$",
    "^miami$", "^vegas$", "^chicago$", "^boston$").map(_.r)

  private case class Want(tags: Seq[String], top: Seq[String], travel: Long,
                          div: Long, locTags: Set[String],
                          pattern: Map[String, Long], tz: String)

  private def reference(posts: Seq[(GenPost, Option[String])]): Option[Want] = {
    val eps = 1e-6
    val locations = scala.collection.mutable.ArrayBuffer[String]()
    val locHashtags = scala.collection.mutable.Set[String]()
    val postingHours = scala.collection.mutable.ArrayBuffer[Int]()
    posts.foreach { case (p, locName) =>
      locName.filter(_.nonEmpty).foreach(locations += _)
      val cap = Option(p.caption_text).getOrElse("")
      if (cap.nonEmpty) {
        tagRe.findAllMatchIn(cap.toLowerCase).map(_.group(1)).foreach { h =>
          if (locPatterns.exists(_.pattern.matcher(h).matches())) locHashtags += h
        }
      }
      cityRe.findAllMatchIn(cap).map(_.group(1)).foreach(locations += _)
      if (p.taken_at != 0)
        postingHours += java.time.Instant.ofEpochSecond(p.taken_at)
          .atZone(java.time.ZoneId.of("Asia/Kathmandu")).getHour
    }
    val normalized = scala.collection.mutable.ArrayBuffer[String]()
    locations.map(_.trim).filter(_.nonEmpty).foreach(l =>
      if (!normalized.contains(l)) normalized += l)
    val (tags, top, travel, div) =
      if (normalized.nonEmpty)
        (normalized.toSeq, normalized.take(10).toSeq,
          normalized.size.toLong, math.min(100L, normalized.size.toLong * 5))
      else (Nil, Nil, 0L, 0L)
    val (pattern, tz) =
      if (postingHours.nonEmpty) {
        val counts = scala.collection.mutable.LinkedHashMap[Int, Long]()
        postingHours.foreach(h => counts(h) = counts.getOrElse(h, 0L) + 1)
        val top5 = counts.toSeq.sortBy(-_._2).take(5).map(_._1)
        val avg = top5.sum.toDouble / top5.length
        if (Seq(6.0, 10.0, 11.0, 15.0, 16.0, 22.0).exists(b => math.abs(avg - b) < eps))
          return None
        val label =
          if (avg >= 6 && avg <= 10) "Morning poster (likely local timezone)"
          else if (avg >= 11 && avg <= 15) "Afternoon poster (likely local timezone)"
          else if (avg >= 16 && avg <= 22) "Evening poster (likely local timezone)"
          else "Night poster (possible different timezone)"
        (counts.map { case (h, n) => h.toString -> n }.toMap, label)
      } else (Map.empty[String, Long], "Unknown")
    Some(Want(tags, top, travel, div, locHashtags.toSet, pattern, tz))
  }

  private val caps = Seq("", "at Mini Spa Home #nyc #beachtravel", "visit Paris City now",
    "#sunsetbeach vibes in Santa Monica", "lowercase only #adventure",
    "Big Apple Trip #city #la", "#citytrip to Lake Como Italy")
  private def postsGen = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, for {
      cap <- Gen.oneOf(caps)
      t <- Gen.frequency(4 -> Gen.choose(clock.cutoff(120), clock.nowEpoch),
        1 -> Gen.const(0L))
      loc <- Gen.oneOf(None, None, Some("Venice Beach"), Some("Paris"), Some(""))
    } yield (GenPost("c0", 0, 1L, 1L, t, cap, "c0", "c0", Nil, false, "feed", "k"), loc))
      .map(_.zipWithIndex.map { case ((p, l), i) => (p.copy(ordinal = i, code = s"k$i"), l) }))

  property("spark location analysis equals the imperative reference port") =
    Prop.forAll(postsGen) { ps =>
      reference(ps) match {
        case None => Prop.passed
        case Some(want) =>
          val posts = ps.map { case (p, loc) => (p, loc.orNull) }.toDF("p", "loc_name")
            .select(col("p.*"), col("loc_name"))
            .withColumn("pk", col("code")).withColumn("id", col("code"))
            .withColumn("is_video", lit(false)).withColumn("media_type", lit(1L))
            .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
            .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
              "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
              "username:string,is_pending:boolean>>)"))
            .withColumn("location", expr(
              "CASE WHEN loc_name IS NULL THEN cast(null as struct<pk:string,lat:double,lng:double,name:string>) " +
                "ELSE named_struct('pk', 'x', 'lat', 0D, 'lng', 0D, 'name', loc_name) END"))
            .drop("loc_name")
          val r = LocationHashtags.locationAnalysis(posts, clock).collect()(0)
          val have = Want(
            r.getSeq[String](r.fieldIndex("location_tags")),
            r.getSeq[String](r.fieldIndex("most_visited_locations")),
            r.getAs[Long]("travel_frequency"),
            r.getAs[Long]("location_diversity_score"),
            r.getSeq[String](r.fieldIndex("location_hashtags")).toSet,
            r.getAs[Map[String, Long]]("posting_timezone_pattern"),
            r.getAs[String]("timezone_estimate"))
          val ok = have == want
          if (!ok) println(s"MISMATCH:\n want=$want\n have=$have\n posts=${ps.map { case (p, l) => (p.ordinal, p.caption_text, l, p.taken_at != 0) }}")
          Prop.propBoolean(ok)
      }
    }
}
