package graft.ig

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for identify_niche
  * (analyze_insta_enhanced.py:962-1112): imperative port as oracle —
  * per-source tokenizers, the weighted-score × count double-count quirk,
  * distribution rounding/filtering, confidence truncation and the
  * definition-order argmax tie-break. */
object NicheDifferentialSpec extends Properties("niche-differential") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-niche-diff")
  import spark.implicits._

  private val cats = ProfileAnalysis.nicheCategories
  private val allKw: Set[String] = cats.flatMap(_._2).toSet

  private def pyround1(x: Double): Double =
    new java.math.BigDecimal(x).setScale(1, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** Direct port (test oracle only). */
  private def reference(bio: String, username: String, fullName: String)
      : (Option[String], Map[String, Double], Map[String, Int], Seq[String]) = {
    def wsTokens(t: String): Seq[String] =
      t.replace(',', ' ').replace('\n', ' ').split("\\s+").toSeq
        .filter(_.nonEmpty).map(_.trim.toLowerCase)
    def unTokens(t: String): Seq[String] = {
      val clean = t.replaceAll("^_+|_+$", "").replace('_', ' ').replace('.', ' ')
      clean.split("\\s+").toSeq.filter(w => w.nonEmpty && w.length > 1)
        .map(_.trim.toLowerCase)
    }
    val sources = Seq(
      ("biography", Option(bio).getOrElse(""), 1.5),
      ("username", Option(username).getOrElse(""), 2.0),
      ("full_name", Option(fullName).getOrElse(""), 1.0))
    val matched = scala.collection.mutable.ArrayBuffer[String]()
    val kwSources = scala.collection.mutable.LinkedHashMap[String, List[String]]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Int]()
    sources.foreach { case (name, text, _) =>
      if (text.nonEmpty) {
        val toks = if (name == "username") unTokens(text) else wsTokens(text)
        toks.filter(allKw).foreach { kw =>
          matched += kw
          kwSources(kw) = kwSources.getOrElse(kw, Nil) :+ name
          counts(kw) = counts.getOrElse(kw, 0) + 1
        }
      }
    }
    val weight = Map("username" -> 2.0, "full_name" -> 1.0, "biography" -> 1.5)
    val scores = scala.collection.mutable.LinkedHashMap[String, Double](
      cats.map(c => c._1 -> 0.0): _*)
    counts.foreach { case (kw, count) =>
      cats.foreach { case (cat, kws) =>
        if (kws.contains(kw)) {
          val weighted = kwSources(kw).map(weight).sum
          scores(cat) += weighted * count // the double-count quirk
        }
      }
    }
    val total = math.max(scores.values.sum, 1.0)
    val dist = scores.toSeq.filter(_._2 > 0)
      .map { case (c, s) => c -> pyround1(s / total * 100) }
      .filter(_._2 >= 2).toMap
    val sorted = scores.toSeq.sortBy(-_._2) // stable → definition order ties
    val overall = sorted.headOption.filter(_._2 > 0).map(_._1)
    val maxScore = if (sorted.nonEmpty && sorted.head._2 > 0) sorted.head._2 else 1.0
    val conf = cats.map { case (c, _) =>
      c -> math.min(100, (scores(c) / maxScore * 100).toInt)
    }.toMap
    (overall, dist, conf, matched.toSeq)
  }

  private val vocab = Seq("fitness", "health", "yoga", "artist", "music",
    "money", "travel", "food", "life", "startup", "skincare", "the", "xx",
    "Fitness!", "art", "dance", "gym,food", "wellness")
  private def textGen(sep: String) = Gen.choose(0, 6).flatMap(k =>
    Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(sep)))

  property("spark niche equals the imperative reference port") =
    Prop.forAll(textGen(" "), Gen.oneOf("fit_life", "art.music_x", "_yoga_", "plainuser", "a"),
      textGen(" ")) { (bio, un, fn) =>
      val profiles = Seq(("c0", bio, un, fn))
        .toDF("creator_key", "biography", "username", "full_name")
      val r = ProfileAnalysis.niche(profiles).select("niche_data.*").collect()(0)
      val want = reference(bio, un, fn)
      val have = (
        Option(r.getAs[String]("overall_niche")),
        r.getAs[Map[String, Double]]("distribution"),
        r.getAs[Map[String, Int]]("confidence_scores"),
        r.getSeq[String](r.fieldIndex("matched_keywords")))
      val ok = have == want
      if (!ok) println(s"MISMATCH bio=[$bio] un=[$un] fn=[$fn]:\n want=$want\n have=$have")
      ok
    }
}
