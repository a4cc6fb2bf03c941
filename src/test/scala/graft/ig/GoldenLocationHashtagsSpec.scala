package graft.ig

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden replay for location analysis and 90-day hashtags/mentions. */
class GoldenLocationHashtagsSpec extends AnyFunSuite {
  import Golden._

  lazy val loc = LocationHashtags.locationAnalysis(posts, IgClock.golden)
    .withColumnRenamed("creator_key", "k")
  lazy val hm = LocationHashtags.hashtagsMentions(posts, IgClock.golden)
    .withColumnRenamed("creator_key", "k")

  private def structMap(row: Row): Map[String, Long] =
    if (row == null) Map() else
      row.schema.fieldNames.zipWithIndex.collect {
        case (n, i) if !row.isNullAt(i) => n -> row.getLong(i)
      }.toMap

  test("location tags / most visited / scores match golden") {
    val g = golden.select(col("username").as("k"),
      col("location_analysis.location_tags").as("g_tags"),
      col("location_analysis.most_visited_locations").as("g_top"),
      col("location_analysis.travel_frequency").as("g_tf"),
      col("location_analysis.location_diversity_score").as("g_div"),
      col("location_analysis.location_hashtags").as("g_lh"))
    val rows = loc.join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      def seq(n: String): Seq[String] =
        Option(r.getSeq[String](r.fieldIndex(n))).getOrElse(Seq())
      assert(seq("location_tags") == seq("g_tags"),
        s"$k tags:\n mine=${seq("location_tags")}\n gold=${seq("g_tags")}")
      assert(seq("most_visited_locations") == seq("g_top"),
        s"$k top:\n mine=${seq("most_visited_locations")}\n gold=${seq("g_top")}")
      assert(r.getAs[Long]("travel_frequency") == r.getAs[Long]("g_tf"), s"$k travel_freq")
      assert(r.getAs[Long]("location_diversity_score") == r.getAs[Long]("g_div"), s"$k diversity")
      assert(seq("location_hashtags").toSet == seq("g_lh").toSet,
        s"$k loc_hashtags: ${seq("location_hashtags")} vs ${seq("g_lh")}")
    }
  }

  test("posting timezone pattern and estimate match golden") {
    val g = golden.select(col("username").as("k"),
      col("location_analysis.posting_timezone_pattern").as("g_pat"),
      col("location_analysis.timezone_estimate").as("g_tz"),
      col("location_analysis.matched_us_cities").as("g_cities"))
    val rows = loc.select(col("k"), col("posting_timezone_pattern"),
      col("timezone_estimate"), size(col("matched_us_cities")).as("m_cities_n"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      val mine = r.getAs[Map[String, Long]]("posting_timezone_pattern")
      val gold = structMap(r.getAs[Row]("g_pat"))
      assert(mine == gold, s"$k pattern: $mine vs $gold")
      assert(r.getAs[String]("timezone_estimate") == r.getAs[String]("g_tz"),
        s"$k tz: ${r.getAs[String]("timezone_estimate")} vs ${r.getAs[String]("g_tz")}")
      assert(r.getAs[Int]("m_cities_n") == 0, s"$k matched_us_cities should be empty")
    }
  }

  test("90-day hashtags and mentions match golden") {
    val g = golden.select(col("username").as("k"),
      col("hashtags_last_90_days").as("g_h"),
      col("mentions_last_90_days").as("g_m"),
      col("posts_analyzed_for_hashtags").as("g_n"),
      col("hashtag_analysis_date_range").as("g_range"))
    val rows = hm.join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      assert(r.getAs[Map[String, Long]]("hashtags_last_90_days") ==
        structMap(r.getAs[Row]("g_h")),
        s"$k hashtags: ${r.getAs[Map[String, Long]]("hashtags_last_90_days")} vs ${structMap(r.getAs[Row]("g_h"))}")
      assert(r.getAs[Map[String, Long]]("mentions_last_90_days") ==
        structMap(r.getAs[Row]("g_m")),
        s"$k mentions: ${r.getAs[Map[String, Long]]("mentions_last_90_days")} vs ${structMap(r.getAs[Row]("g_m"))}")
      assert(r.getAs[Long]("posts_analyzed_for_hashtags") == r.getAs[Long]("g_n"),
        s"$k n: ${r.getAs[Long]("posts_analyzed_for_hashtags")} vs ${r.getAs[Long]("g_n")}")
      assert(r.getAs[String]("hashtag_analysis_date_range") == r.getAs[String]("g_range"),
        s"$k range: ${r.getAs[String]("hashtag_analysis_date_range")} vs ${r.getAs[String]("g_range")}")
    }
  }
}
