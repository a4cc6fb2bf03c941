package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for identify_gender
  * (analyze_insta_enhanced.py:714-788): first-matching-pronoun cascade,
  * substring presence counts and the Female > Male > Non-binary tie
  * priority, ported imperatively. */
object GenderDifferentialSpec extends Properties("gender-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  lazy val spark = graft.Sessions.local("4", "graft-gender-diff")
  import spark.implicits._

  private val female = Seq("she/her", "she", "her", "woman", "girl", "female", "lady",
    "mom", "mother", "wife", "daughter", "sister", "girlfriend", "actress",
    "queen", "princess", "mama", "mum", "mummy", "mommy", "mrs", "ms", "miss")
  private val male = Seq("he/him", "he", "him", "man", "boy", "male", "guy", "dad",
    "father", "husband", "son", "brother", "boyfriend", "actor", "king",
    "prince", "papa", "daddy", "mr")
  private val nb = Seq("they/them", "them", "they", "non-binary", "nonbinary", "nb",
    "enby", "genderfluid", "genderqueer", "agender", "ze/zir", "xe/xem")
  private val pf = Seq("she/her", "she", "her")
  private val pm = Seq("he/him", "he", "him")
  private val pn = Seq("they/them", "they", "them", "ze/zir", "xe/xem", "it/its")

  /** Direct port (test oracle only). */
  private def reference(pronouns: Seq[String], bio: String, fullName: String,
                        username: String): String = {
    val all = (pf ++ pm ++ pn).toSet
    val firstPronoun = pronouns.map(_.trim.toLowerCase).find(all)
    firstPronoun match {
      case Some(p) if pf.contains(p) => "Female"
      case Some(p) if pm.contains(p) => "Male"
      case Some(p) if pn.contains(p) => "Non-binary"
      case _ =>
        val text = Seq(bio, fullName, username).map(t =>
          Option(t).getOrElse("").toLowerCase).mkString(" ")
        def cnt(ws: Seq[String]) = ws.count(text.contains)
        val (fs, ms, ns) = (cnt(female), cnt(male), cnt(nb))
        val mx = Seq(fs, ms, ns).max
        if (mx == 0) "Unknown"
        else if (fs == mx) "Female"
        else if (ms == mx) "Male"
        else "Non-binary"
    }
  }

  private val bioWords = Seq("mom", "dad", "they", "vibes", "Queen", "mr", "miss",
    "actor", "girlboss", "manager", "woman", "history", "nb", "agender", "grandma")
  private val bioGen = Gen.choose(0, 5).flatMap(k =>
    Gen.listOfN(k, Gen.oneOf(bioWords)).map(_.mkString(" ")))
  private val pronounsGen: Gen[Seq[String]] = Gen.oneOf(
    Seq[String](), Seq("she/her"), Seq("custom", "he/him"),
    Seq("They/Them "), Seq("it/its"), Seq("xyz"))

  property("spark gender equals the imperative reference port") =
    Prop.forAll(pronounsGen, bioGen, Gen.oneOf("Anna Mx", "Mr Big", "plain", ""),
      Gen.oneOf("momlife_x", "user1", "the_man")) { (prons, bio, fn, un) =>
      val df = Seq((prons, bio, fn, un)).toDF("pronouns", "biography", "full_name", "username")
        .select(Extraction.gender(col("pronouns"), col("biography"),
          col("full_name"), col("username")).as("g"))
      val have = df.collect()(0).getString(0)
      val want = reference(prons, bio, fn, un)
      if (have != want)
        println(s"MISMATCH prons=$prons bio=[$bio] fn=[$fn] un=[$un]: want=$want have=$have")
      have == want
    }
}
