package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for extract_hashtags_and_mentions
  * (analyze_insta_enhanced.py:1545-1621): the top-10 maps' membership
  * under count ties depends on dict insertion order (first occurrence) —
  * verified against an imperative port over tie-heavy generated captions. */
object HashtagDifferentialSpec extends Properties("hashtag-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-hashtag-diff")
  import spark.implicits._

  private val clock = IgClock.golden
  private val cutoff = clock.cutoff(90)

  private val stop = Set("the", "and", "for", "from", "with", "this", "that",
    "have", "has", "her", "his", "our", "my", "your", "their", "its",
    "as", "at", "by", "to", "in", "on", "of", "or", "if")
  private val tagRe = "#([A-Za-z0-9_]+)".r
  private val menRe = "@([A-Za-z0-9._]+)".r

  /** Direct port (test oracle only): (hashtags top-10, mentions top-10, n). */
  private def reference(posts: Seq[GenPost])
      : (Seq[(String, Long)], Seq[(String, Long)], Long) = {
    val h = scala.collection.mutable.LinkedHashMap[String, Long]()
    val m = scala.collection.mutable.LinkedHashMap[String, Long]()
    var n = 0L
    posts.foreach { p =>
      if (p.taken_at != 0 && p.taken_at >= cutoff) { // null ts → TypeError skip
        n += 1
        val cap = Option(p.caption_text).getOrElse("")
        if (cap.nonEmpty) {
          tagRe.findAllMatchIn(cap).map(_.group(1).toLowerCase).foreach(t =>
            h(t) = h.getOrElse(t, 0L) + 1)
          menRe.findAllMatchIn(cap).map(_.group(1))
            .filter(x => x.length >= 3 && !stop(x.toLowerCase))
            .map(_.toLowerCase).foreach(x => m(x) = m.getOrElse(x, 0L) + 1)
        }
      }
    }
    // sorted(key=count, reverse=True) stable over insertion order, top 10
    def top(c: scala.collection.mutable.LinkedHashMap[String, Long]) =
      c.toSeq.sortBy(-_._2).take(10)
    (top(h), top(m), n)
  }

  private val words = Seq("#a1", "#a2", "#a3", "#b1", "#b2", "#c1", "#c2",
    "#d1", "#e1", "#f1", "#g1", "#h1", "#i1", "@brand.x", "@brand.y",
    "@the", "@ab", "plain", "#A1", "#Mixed_Case")
  private def capGen = Gen.choose(0, 6).flatMap(k =>
    Gen.listOfN(k, Gen.oneOf(words)).map(_.mkString(" ")))

  private def postsGen = Gen.choose(1, 15).flatMap(n =>
    Gen.listOfN(n, for {
      cap <- capGen
      t <- Gen.frequency(
        4 -> Gen.choose(cutoff, clock.nowEpoch),       // inside window
        1 -> Gen.choose(clock.cutoff(300), cutoff - 1), // outside
        1 -> Gen.const(0L))                             // null-ish ts
    } yield GenPost("c0", 0, 1L, 1L, t, cap, "c0", "c0", Nil, false, "feed", "k"))
      .map(_.zipWithIndex.map { case (p, i) => p.copy(ordinal = i, code = s"k$i") }))

  property("spark top-10 maps equal the imperative reference port") =
    Prop.forAll(postsGen) { ps =>
      val posts = ps.toDF()
        .withColumn("pk", col("code")).withColumn("id", col("code"))
        .withColumn("is_video", lit(false)).withColumn("media_type", lit(1L))
        .withColumn("sponsor_usernames", expr("cast(array() as array<string>)"))
        .withColumn("sponsor_tags", expr("cast(null as array<struct<" +
          "sponsor:struct<pk:string,username:string,id:string,full_name:string>," +
          "username:string,is_pending:boolean>>)"))
        .withColumn("location",
          expr("cast(null as struct<pk:string,lat:double,lng:double,name:string>)"))
      val r = LocationHashtags.hashtagsMentions(posts, clock).collect()(0)
      val (wantH, wantM, wantN) = reference(ps)
      val haveH = r.getAs[Map[String, Long]]("hashtags_last_90_days")
      val haveM = r.getAs[Map[String, Long]]("mentions_last_90_days")
      val ok = haveH == wantH.toMap && haveM == wantM.toMap &&
        r.getAs[Long]("posts_analyzed_for_hashtags") == wantN
      if (!ok) println(s"MISMATCH:\n wantH=$wantH haveH=$haveH\n wantM=$wantM haveM=$haveM\n wantN=$wantN haveN=${r.getAs[Long]("posts_analyzed_for_hashtags")}")
      ok
    }
}
