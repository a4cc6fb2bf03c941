package graft.ig

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden replay for fake-follower, personality and niche analyses. */
class GoldenProfileAnalysisSpec extends AnyFunSuite {
  import Golden._

  test("fake follower analysis matches golden") {
    val m = ProfileAnalysis.fakeFollowers(posts, profiles)
      .withColumnRenamed("creator_key", "k")
    val g = golden.select(col("username").as("k"),
      col("fake_follower_analysis.fake_follower_score").as("g_score"),
      col("fake_follower_analysis.authenticity_score").as("g_auth"),
      col("fake_follower_analysis.engagement_quality").as("g_quality"),
      col("fake_follower_analysis.suspicious_indicators").as("g_ind"))
    val rows = m.join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      assert(r.getAs[Long]("fake_follower_score") == r.getAs[Long]("g_score"),
        s"$k score: ${r.getAs[Long]("fake_follower_score")} vs ${r.getAs[Long]("g_score")}")
      assert(r.getAs[Long]("authenticity_score") == r.getAs[Long]("g_auth"), s"$k auth")
      assert(r.getAs[String]("engagement_quality") == r.getAs[String]("g_quality"), s"$k quality")
      val gi = Option(r.getSeq[String](r.fieldIndex("g_ind"))).getOrElse(Seq())
      assert(r.getSeq[String](r.fieldIndex("suspicious_indicators")) == gi, s"$k indicators")
    }
  }

  test("personality traits and insights match golden") {
    val metrics = Engagement.metrics(posts, profiles, IgClock.golden)
    val m = ProfileAnalysis.personality(profiles, metrics)
      .withColumnRenamed("creator_key", "k")
    val g = golden.select(col("username").as("k"),
      col("personality_traits").as("g_t"), col("profile_insights").as("g_i"))
    val rows = m.join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      val mt = r.getAs[Row]("personality_traits"); val gt = r.getAs[Row]("g_t")
      Seq("professional", "creative", "social", "authentic", "aspirational",
        "educational", "entertaining").foreach { f =>
        assert(mt.getAs[Long](f) == gt.getAs[Long](f),
          s"$k trait $f: ${mt.getAs[Long](f)} vs ${gt.getAs[Long](f)}")
      }
      val mi = r.getAs[Row]("profile_insights"); val gi = r.getAs[Row]("g_i")
      Seq("personality_type", "content_style", "audience_appeal", "brand_potential")
        .foreach { f =>
          assert(mi.getAs[String](f) == gi.getAs[String](f),
            s"$k insight $f: ${mi.getAs[String](f)} vs ${gi.getAs[String](f)}")
        }
      assert(mi.getAs[Long]("authenticity_score") == gi.getAs[Long]("authenticity_score"),
        s"$k authenticity: ${mi.getAs[Long]("authenticity_score")} vs ${gi.getAs[Long]("authenticity_score")}")
    }
  }

  lazy val nicheDf = ProfileAnalysis.niche(profiles).withColumnRenamed("creator_key", "k")

  test("niche: overall, distribution, confidence, niche_scores match golden") {
    val g = golden.select(col("username").as("k"),
      col("niche_data.overall_niche").as("g_overall"),
      col("niche_data.distribution").as("g_dist"),
      col("niche_data.confidence_scores").as("g_conf"),
      col("niche_data.niche_scores").as("g_scores"))
    val rows = nicheDf.select(col("k"),
      col("niche_data.overall_niche").as("m_overall"),
      to_json(col("niche_data.distribution")).as("m_dist"),
      to_json(col("niche_data.confidence_scores")).as("m_conf"),
      to_json(col("niche_data.niche_scores")).as("m_scores"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      assert(String.valueOf(r.getAs[String]("m_overall")) ==
        String.valueOf(r.getAs[String]("g_overall")), s"$k overall")
      // golden structs → compare field-by-field via json of our map vs struct values
      def mapOf(json: String): Map[String, Double] =
        if (json == null) Map() else
          json.stripPrefix("{").stripSuffix("}").split(",").filter(_.contains(":"))
            .map { kv =>
              val i = kv.lastIndexOf(":")
              kv.take(i).trim.stripPrefix("\"").stripSuffix("\"") -> kv.drop(i + 1).toDouble
            }.toMap
      def structMap(row: Row): Map[String, Double] =
        if (row == null) Map() else
          row.schema.fieldNames.zipWithIndex.collect {
            case (n, i) if !row.isNullAt(i) => n -> (row.get(i) match {
              case d: Double => d; case l: Long => l.toDouble; case x => x.toString.toDouble
            })
          }.toMap
      assert(mapOf(r.getAs[String]("m_dist")) == structMap(r.getAs[Row]("g_dist")),
        s"$k distribution: ${r.getAs[String]("m_dist")} vs ${r.getAs[Row]("g_dist")}")
      assert(mapOf(r.getAs[String]("m_conf")) == structMap(r.getAs[Row]("g_conf")),
        s"$k confidence: ${r.getAs[String]("m_conf")} vs ${r.getAs[Row]("g_conf")}")
      assert(mapOf(r.getAs[String]("m_scores")) == structMap(r.getAs[Row]("g_scores")),
        s"$k scores: ${r.getAs[String]("m_scores")} vs ${r.getAs[Row]("g_scores")}")
    }
  }

  test("niche: matched keywords and per-source analysis match golden") {
    val g = golden.select(col("username").as("k"),
      col("niche_data.matched_keywords").as("g_mk"),
      col("niche_data.source_analysis.biography.matched_keywords").as("g_bio_mk"),
      col("niche_data.source_analysis.username.matched_keywords").as("g_un_mk"),
      col("niche_data.source_analysis.full_name.matched_keywords").as("g_fn_mk"))
    val rows = nicheDf.select(col("k"),
      col("niche_data.matched_keywords").as("m_mk"),
      col("niche_data.source_analysis.biography.matched_keywords").as("m_bio_mk"),
      col("niche_data.source_analysis.username.matched_keywords").as("m_un_mk"),
      col("niche_data.source_analysis.full_name.matched_keywords").as("m_fn_mk"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      def seq(n: String): Seq[String] =
        Option(r.getSeq[String](r.fieldIndex(n))).getOrElse(Seq())
      assert(seq("m_mk") == seq("g_mk"), s"$k matched: ${seq("m_mk")} vs ${seq("g_mk")}")
      assert(seq("m_bio_mk") == seq("g_bio_mk"), s"$k bio matched")
      assert(seq("m_un_mk") == seq("g_un_mk"), s"$k username matched")
      assert(seq("m_fn_mk") == seq("g_fn_mk"), s"$k full_name matched")
    }
  }
}
