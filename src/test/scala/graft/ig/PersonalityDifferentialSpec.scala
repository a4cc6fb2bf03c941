package graft.ig

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for analyze_profile_personality
  * (analyze_insta_enhanced.py:312-388): imperative port as oracle —
  * presence-count traits, the dict-insertion-order argmax tie-break,
  * Python round() (half-even to int) for the authenticity score, and the
  * brand-potential ladder over `prof*20 + er*5 + consistency`. */
object PersonalityDifferentialSpec extends Properties("personality-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = graft.Sessions.local("4", "graft-personality-diff")
  import spark.implicits._

  private val professionalW = Seq("ceo", "founder", "entrepreneur", "business",
    "professional", "expert", "consultant", "coach")
  private val creativeW = Seq("artist", "creative", "designer", "photographer",
    "writer", "musician", "creator")
  private val socialW = Seq("love", "friends", "family", "community", "together",
    "sharing", "connect")

  private def pyroundInt(x: Double): Long =
    new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_EVEN).longValue()

  /** Direct port (test oracle only). */
  private def reference(bio: String, pf: String, cs: Double, er: Double)
      : (Map[String, Long], String, String, Long) = {
    val bioL = Option(bio).getOrElse("").toLowerCase
    var professional = professionalW.count(bioL.contains).toLong
    val creative = creativeW.count(bioL.contains).toLong
    val social = socialW.count(bioL.contains).toLong
    var authentic = 0L
    if (pf.toLowerCase.contains("daily")) authentic += 2
    if (cs > 70) professional += 1
    val traits = scala.collection.immutable.ListMap(
      "professional" -> professional, "creative" -> creative, "social" -> social,
      "authentic" -> authentic, "aspirational" -> 0L, "educational" -> 0L,
      "entertaining" -> 0L)
    val (maxName, maxV) = traits.maxBy(_._2) // ListMap: first max wins, like dict
    val ptype = if (maxV > 0) maxName.capitalize else "Balanced"
    val auth = pyroundInt(cs / 100.0 * 30.0 +
      math.min(social * 10.0, 30.0) + math.min(er * 2.0, 40.0))
    val brandScore = professional * 20.0 + er * 5.0 + cs
    val brand = if (brandScore > 150) "High" else if (brandScore > 75) "Medium" else "Low"
    (traits, ptype, brand, auth)
  }

  private val bioWords = professionalW ++ creativeW ++ socialW ++
    Seq("skincare", "the", "noise", "Daily", "plain")
  private val bioGen = Gen.choose(0, 8).flatMap(k =>
    Gen.listOfN(k, Gen.oneOf(bioWords)).map(_.mkString(" ")))
  private val pfGen = Gen.oneOf("Daily", "Weekly", "Bi-Weekly", "Monthly", "Unknown", "daily-ish")
  private val csGen = Gen.chooseNum(0, 1000).map(_ / 10.0)
  private val erGen = Gen.chooseNum(0, 400).map(_ / 10.0)

  property("spark personality equals the imperative reference port") =
    Prop.forAll(bioGen, pfGen, csGen, erGen) { (bio, pf, cs, er) =>
      val profiles = Seq(("c0", bio)).toDF("creator_key", "biography")
      val metrics = Seq(("c0", pf, cs, er))
        .toDF("creator_key", "post_frequency", "consistency_score", "engagement_rate")
      val r = ProfileAnalysis.personality(profiles, metrics).collect()(0)
      val t = r.getStruct(r.fieldIndex("personality_traits"))
      val ins = r.getStruct(r.fieldIndex("profile_insights"))
      val haveTraits = Map(
        "professional" -> t.getAs[Long]("professional"),
        "creative" -> t.getAs[Long]("creative"),
        "social" -> t.getAs[Long]("social"),
        "authentic" -> t.getAs[Long]("authentic"),
        "aspirational" -> t.getAs[Long]("aspirational"),
        "educational" -> t.getAs[Long]("educational"),
        "entertaining" -> t.getAs[Long]("entertaining"))
      val have = (haveTraits, ins.getAs[String]("personality_type"),
        ins.getAs[String]("brand_potential"), ins.getAs[Long]("authenticity_score"))
      val (wTraits, wType, wBrand, wAuth) = reference(bio, pf, cs, er)
      val want = (wTraits: Map[String, Long], wType, wBrand, wAuth)
      val ok = have == want
      if (!ok) println(s"MISMATCH bio=[$bio] pf=[$pf] cs=$cs er=$er:\n want=$want\n have=$have")
      ok
    }
}
