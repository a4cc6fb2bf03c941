package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for the collaboration cascade: a direct imperative
  * re-implementation of identify_collaborations
  * (analyze_insta_enhanced.py:1253-1487) serves as the oracle over
  * generated posts — catching order/dedup divergence beyond the nine
  * golden creators. */
object CollabDifferentialSpec extends Properties("collab-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  lazy val spark = graft.Sessions.local("4", "graft-collab-diff")
  import spark.implicits._

  private val clock = IgClock.golden
  private val cutoff = clock.cutoff(300)

  private val stop = Set("the", "and", "for", "from", "with", "this", "that",
    "have", "has", "her", "his", "our", "my", "your", "their", "its",
    "as", "at", "by", "to", "in", "on", "of", "or", "if")
  private val mentionRe = "@([A-Za-z0-9._]+)".r

  /** Direct port of the reference loop (test oracle only). */
  private def reference(posts: Seq[GenPost]): (Option[String], Seq[(String, Boolean, String)], Long) = {
    if (posts.isEmpty) return (None, Nil, 0L)
    val uname = Option(posts.head.user_username).filter(_ != null)
    var finalStatus: Option[String] = None
    val all = scala.collection.mutable.ArrayBuffer[(String, Boolean, String)]()
    var recent = 0L
    val seen = scala.collection.mutable.Set[String]()
    def mentions(cap: String): Seq[String] =
      mentionRe.findAllMatchIn(Option(cap).getOrElse("")).map(_.group(1)).toSeq
        .filter(m => m.length >= 3 && !stop(m.toLowerCase))
    def isRecent(t: Long): Boolean = t != 0 && t > cutoff
    // pass 1: first paid post's mentions
    posts.find(_.is_paid_partnership).foreach { p =>
      finalStatus = Some("Active")
      mentions(p.caption_text).foreach { m =>
        if (!seen(m)) {
          all += ((m, isRecent(p.taken_at), "paid_partnership")); seen += m
          if (isRecent(p.taken_at)) recent += 1
        }
      }
    }
    // pass 2: owners then coauthors, all posts
    posts.foreach { p =>
      val r = isRecent(p.taken_at)
      val o = Option(p.owner_username).filter(_.nonEmpty)
      o.foreach { ow =>
        if (!uname.contains(ow) && !seen(ow)) {
          all += ((ow, r, "owner")); seen += ow
          if (r) recent += 1
        }
      }
      p.coauthor_usernames.filter(c => c != null && c.nonEmpty).foreach { c =>
        if (!uname.contains(c) && !seen(c)) {
          all += ((c, r, "coauthor")); seen += c
          if (r) recent += 1
        }
      }
    }
    // pass 3: only if no paid post — first #ad/#collab post's mentions
    if (finalStatus.isEmpty) {
      posts.find { p =>
        val cl = Option(p.caption_text).getOrElse("").toLowerCase
        cl.contains("#ad") || cl.contains("#collab")
      }.foreach { p =>
        finalStatus = Some("Active")
        mentions(p.caption_text).foreach { m =>
          if (!seen(m)) {
            all += ((m, isRecent(p.taken_at), "tag")); seen += m
            if (isRecent(p.taken_at)) recent += 1
          }
        }
      }
    }
    // status fallbacks
    if (finalStatus.isEmpty && uname.isDefined) {
      if (posts.exists(p => Option(p.owner_username).exists(o =>
        o.nonEmpty && o != uname.get))) finalStatus = Some("Active")
      else if (posts.exists(_.coauthor_usernames.exists(c =>
        c != null && c.nonEmpty && c != uname.get))) finalStatus = Some("Active")
    }
    (finalStatus, all.toSeq, recent)
  }

  /** Direct port of extract_ugc_examples (:1114-1251), test oracle only. */
  private def referenceUgc(posts: Seq[GenPost]): String = {
    if (posts.isEmpty) return ""
    val uname = Option(posts.head.user_username).filter(_ != null)
    val codes = scala.collection.mutable.ArrayBuffer[String]()
    def clips = posts.filter(p => p.product_type == "clips" &&
      p.code != null && p.code.nonEmpty)
    def add(code: String): Unit =
      if (codes.size < 3 && !codes.contains(code)) codes += code
    clips.filter(_.is_paid_partnership).foreach(p => add(p.code))
    if (codes.size < 3) clips.filter { p =>
      val cl = Option(p.caption_text).getOrElse("").toLowerCase
      cl.contains("#ad") || cl.contains("#collab")
    }.foreach(p => add(p.code))
    if (codes.size < 3 && uname.isDefined) clips.filter(p =>
      Option(p.owner_username).exists(o => o.nonEmpty && o != uname.get))
      .foreach(p => add(p.code))
    if (codes.size < 3 && uname.isDefined) clips.filter(_.coauthor_usernames
      .exists(c => c != null && c.nonEmpty && c != uname.get))
      .foreach(p => add(p.code))
    codes.map(c => s"https://www.instagram.com/p/$c").mkString(" | ")
  }

  private val capGen = Gen.oneOf(
    "say hi to @brand.one and @an #ad", "#collab with @second_brand ok",
    "plain caption", "@xy too-short @the stopword", "#adventure time @trailmix",
    "", "@Brand.One case Differs #AD")
  private def postsGen(ci: Int) = Gen.choose(0, 8).flatMap(n =>
    Gen.listOfN(n, for {
      cap <- capGen
      paid <- Gen.frequency(1 -> true, 4 -> false)
      t <- Gen.oneOf(Gen.const(0L), Gen.choose(clock.cutoff(400), clock.nowEpoch))
      owner <- Gen.oneOf(s"c$ci", "other_owner", "")
      coas <- Gen.oneOf(Seq(), Seq("coa1"), Seq("coa1", s"c$ci"))
      pt <- Gen.oneOf("clips", "clips", "feed")
    } yield GenPost(s"c$ci", 0, 1L, 1L, t, cap, s"c$ci", owner, coas,
      paid, pt, "k")).map(
      _.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"k$i") }))

  property("spark cascade equals the imperative reference port") =
    Prop.forAll(Gen.choose(1, 3).flatMap(n =>
      Gen.sequence[List[List[GenPost]], List[GenPost]]((0 until n).map(postsGen).toList))) { pss =>
      val flat = pss.flatten
      if (flat.isEmpty) Prop.passed else Prop.propBoolean {
        val df = flat.toDF()
          .withColumn("pk", col("code")).withColumn("id", col("code"))
          .withColumn("is_video", lit(false)).withColumn("media_type", lit(1L))
          .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
          .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
            "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
            "username:string,is_pending:boolean>>)"))
          .withColumn("location",
            expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)"))
        val got = Partnerships.collaborations(df, clock).collect().map { r =>
          r.getAs[String]("creator_key") -> ((
            Option(r.getAs[String]("collaboration_status")),
            r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("all_collaborations"))
              .map(c => (c.getAs[String]("name"), c.getAs[Boolean]("is_recent"),
                c.getAs[String]("source"))),
            r.getAs[Long]("recent_collaborations")))
        }.toMap
        val gotUgc = Partnerships.ugcExamples(df).collect()
          .map(r => r.getAs[String]("creator_key") -> r.getAs[String]("ugc_examples")).toMap
        pss.filter(_.nonEmpty).forall { ps =>
          val key = ps.head.creator_key
          val want = reference(ps)
          val have = got(key)
          val wantUgc = referenceUgc(ps)
          val haveUgc = gotUgc.getOrElse(key, "")
          val ok = have == ((want._1, want._2, want._3)) && haveUgc == wantUgc
          if (!ok) println(s"MISMATCH $key:\n want=$want ugc=[$wantUgc]\n have=$have ugc=[$haveUgc]\n posts=${ps.map(p => (p.ordinal, p.caption_text, p.is_paid_partnership, p.owner_username, p.coauthor_usernames, p.product_type, p.taken_at != 0))}")
          ok
        }
      }
    }
}
