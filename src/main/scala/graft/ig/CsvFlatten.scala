package graft.ig

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 130-column CSV report flatten — SURVEY §2.2 O-21/O-22, §2.7
  * O-70/O-72/O-73/O-74, faithful to jsontocsv_enhanced.py:27-321.
  *
  * Fidelity notes:
  *  - `age`/`age_group` read fields the analyzer never emits
  *    (jsontocsv_enhanced.py:342-400, SURVEY §1.3) — they are part of the
  *    130-column contract but always empty; kept as empty literals.
  *  - every string cell gets `,` → ` ` (:310) including the JSON-dump
  *    cells; biography additionally `\n` → ` ` + strip (:97).
  *  - post{i}_url uses the never-present `shortcode` → literal `…/p//`
  *    (:146, SURVEY §1.3 drift).
  *  - JSON cells use to_json (compact separators; the reference's
  *    json.dumps uses ", "/": " — a whitespace-only difference).
  *
  * Scale: one wide projection — no shuffle beyond the inherited sort; the
  * fixed-width 6-post pivot is element_at, not a pivot shuffle
  * (SURVEY §7.4 item 7).
  */
object CsvFlatten {

  private def clean(c: Column): Column = translate(coalesce(c, lit("")), ",", " ")
  private def cleanNum(c: Column): Column = coalesce(c.cast("string"), lit(""))
  private def pyBool(c: Column): Column =
    when(c, lit("True")).otherwise(lit("False"))
  private def pipeJoin(c: Column): Column =
    translate(array_join(coalesce(c, expr("array()").cast("array<string>")), " | "), ",", " ")

  /** analyzed report (Report.assemble output) → 130-col flat DataFrame in
    * header order, sorted by average_engagement_rate desc (:45-47). */
  def flatten(report: DataFrame): DataFrame = {
    val username = coalesce(col("username"), lit(""))

    def postCell(i: Int, f: String): Column =
      when(size(col("top_6_posts")) >= i,
        element_at(col("top_6_posts"), i).getField(f).cast("string"))
        .otherwise(lit(""))

    val postCols: Seq[Column] = (1 to 6).flatMap { i =>
      Seq(
        postCell(i, "interaction_score").as(s"post${i}_interaction_score"),
        postCell(i, "likes").as(s"post${i}_likes"),
        postCell(i, "comments").as(s"post${i}_comments"),
        postCell(i, "engagement_rate").as(s"post${i}_er"),
        clean(postCell(i, "post_code")).as(s"post${i}_code"),
        when(size(col("top_6_posts")) >= i,
          lit("https://www.instagram.com/p//")).otherwise(lit(""))
          .as(s"post${i}_url"),
        clean(postCell(i, "taken_at")).as(s"post${i}_date"))
    }

    val tiktok = coalesce(col("social_links.tiktok"), lit(""))
    val youtube = coalesce(col("social_links.youtube"), lit(""))
    val linktree = coalesce(col("social_links.linktree"), lit(""))

    val priceUsd = concat_ws("|",
      concat(lit("TIME_15_SECONDS:"), cleanNum(col("creator_pricing_metrics.time_15_seconds"))),
      concat(lit("TIME_30_SECONDS:"), cleanNum(col("creator_pricing_metrics.time_30_seconds"))),
      concat(lit("TIME_60_SECONDS:"), cleanNum(col("creator_pricing_metrics.time_60_seconds"))),
      concat(lit("TIME_1_TO_5_MINUTES:"), cleanNum(col("creator_pricing_metrics.time_1_to_5_minutes"))),
      concat(lit("TIME_GREATER_THAN_5_MINUTES:"),
        cleanNum(col("creator_pricing_metrics.time_greater_than_5_minutes"))))

    val collabFilteredSql =
      "filter(coalesce(top_collaboration, cast(array() as " +
        "array<struct<name:string,count:bigint,is_recent:boolean,source:string>>)), " +
        "c -> c.source IN ('paid_partnership', 'tag'))"
    val topCollabStr = translate(
      array_join(expr(s"transform($collabFilteredSql, c -> c.name)"), " | "),
      ",", " ")
    val topCollabLogo = translate(array_join(expr(
      s"transform(filter($collabFilteredSql, c -> c.name IS NOT NULL AND c.name != ''), " +
        "c -> concat(c.name, ';https://assets.veelapp.com/', " +
        "lower(replace(c.name, ' ', '_')), '.jpg'))"), " | "), ",", " ")

    report.orderBy(desc("average_engagement_rate")).select(Seq(
      clean(col("username")).as("username"),
      clean(col("full_name")).as("full_name"),
      clean(col("first_name")).as("first_name"),
      clean(col("last_name")).as("last_name"),
      clean(trim(regexp_replace(coalesce(col("biography"), lit("")), "\n", " ")))
        .as("biography"),
      lit("").as("age_group"), // no age source fields exist (SURVEY §1.3)
      lit("").as("age"),
      clean(col("gender")).as("gender"),
      clean(col("email")).as("email"),
      clean(col("phone_number")).as("phone_number"),
      cleanNum(coalesce(col("follower_count"), lit(0L))).as("follower_count"),
      clean(col("creator_size")).as("creator_size"),
      clean(col("creator_type")).as("creator_type"),
      clean(col("tier")).as("tier"),
      clean(col("business_category")).as("business_category"),
      clean(col("profile_picture")).as("profile_picture"),
      clean(tiktok).as("tiktok_link"),
      clean(youtube).as("youtube_link"),
      clean(linktree).as("linktree_link"),
      translate(array_join(expr(
        "filter(array(social_links.tiktok, social_links.youtube, social_links.linktree), " +
          "l -> l IS NOT NULL AND l != '')"), " | "), ",", " ").as("other_social_media"),
      when(username =!= "", concat(lit("https://www.instagram.com/"), username))
        .otherwise(lit("")).as("primary_social_link"),
      cleanNum(col("total_posts_last_3_months")).as("total_posts_last_3_months"),
      cleanNum(col("average_engagement_rate")).as("average_engagement_rate"),
      cleanNum(col("engagement_metrics.total_posts_analyzed")).as("total_posts_analyzed"),
      cleanNum(col("engagement_metrics.engagement_rate")).as("engagement_rate_overall"),
      cleanNum(col("engagement_metrics.avg_likes")).as("avg_likes"),
      cleanNum(col("engagement_metrics.avg_comments")).as("avg_comments"),
      cleanNum(col("engagement_metrics.avg_shares")).as("avg_shares"),
      cleanNum(col("engagement_metrics.avg_engagement_per_post")).as("avg_engagement_per_post"),
      cleanNum(col("engagement_metrics.consistency_score")).as("consistency_score"),
      cleanNum(col("engagement_metrics.viral_posts_count")).as("viral_posts_count"),
      clean(col("engagement_metrics.post_frequency")).as("post_frequency"),
      clean(col("engagement_metrics.engagement_trend")).as("engagement_trend"),
      clean(col("engagement_metrics.best_posting_time")).as("best_posting_time")) ++
      postCols ++ Seq(
      clean(col("collaboration_status")).as("collaboration_status"),
      cleanNum(col("total_collaborations")).as("total_collaborations"),
      cleanNum(col("recent_collaborations")).as("recent_collaborations"),
      clean(col("ugc_examples")).as("ugc_examples"),
      pyBool(coalesce(col("partnership_data.has_paid_partnerships"), lit(false)))
        .as("has_paid_partnerships"),
      cleanNum(col("partnership_data.total_sponsored_posts")).as("total_sponsored_posts"),
      cleanNum(col("partnership_data.avg_sponsored_engagement")).as("avg_sponsored_engagement"),
      cleanNum(col("partnership_data.avg_organic_engagement")).as("avg_organic_engagement"),
      cleanNum(col("partnership_data.collaboration_score")).as("collaboration_score"),
      clean(to_json(col("partnership_data.sponsor_frequency"))).as("sponsor_frequency"),
      pipeJoin(col("partnership_data.brand_mentions")).as("brand_mentions"),
      pipeJoin(col("location_analysis.location_tags")).as("location_tags"),
      pipeJoin(col("location_analysis.most_visited_locations")).as("most_visited_locations"),
      pipeJoin(col("location_analysis.location_hashtags")).as("location_hashtags"),
      clean(col("location_analysis.timezone_estimate")).as("timezone_estimate"),
      cleanNum(col("location_analysis.location_diversity_score")).as("location_diversity_score"),
      // bio_location/primary_location/state_country_data are never emitted
      // by the analyzer (SURVEY §1.3) — always empty
      lit("").as("bio_location"),
      lit("").as("primary_location_lat"),
      lit("").as("primary_location_lng"),
      lit("").as("primary_location_names"),
      lit("").as("primary_location_post_count"),
      lit("").as("matched_city"),
      lit("").as("matched_state"),
      lit("").as("matched_country"),
      lit("").as("matched_timezone"),
      lit("").as("location_distance_km"),
      cleanNum(col("fake_follower_analysis.fake_follower_score")).as("fake_follower_score"),
      cleanNum(col("fake_follower_analysis.authenticity_score")).as("authenticity_score"),
      clean(col("fake_follower_analysis.engagement_quality")).as("engagement_quality"),
      pipeJoin(col("fake_follower_analysis.suspicious_indicators")).as("suspicious_indicators"),
      clean(to_json(col("personality_traits"))).as("personality_traits"),
      clean(to_json(col("profile_insights"))).as("profile_insights"),
      clean(col("niche_data.overall_niche")).as("niche_overall"),
      clean(to_json(col("niche_data.distribution"))).as("niche_distribution"),
      clean(to_json(col("niche_data.confidence_scores"))).as("niche_confidence_scores"),
      // top-10 by count desc; Python re-sorts the (already sorted) map
      // stably, preserving its insertion order on ties (:206-208)
      translate(array_join(expr(
        "transform(array_sort(map_entries(hashtags_last_90_days), " +
          "(a, b) -> CASE WHEN a.value > b.value THEN -1 WHEN a.value < b.value THEN 1 ELSE 0 END), " +
          "e -> e.key)"), " | "), ",", " ").as("top_hashtags_90d"),
      translate(array_join(expr(
        "transform(array_sort(map_entries(mentions_last_90_days), " +
          "(a, b) -> CASE WHEN a.value > b.value THEN -1 WHEN a.value < b.value THEN 1 ELSE 0 END), " +
          "e -> e.key)"), " | "), ",", " ").as("top_mentions_90d"),
      cleanNum(col("posts_analyzed_for_hashtags")).as("posts_analyzed_for_hashtags"),
      clean(col("hashtag_analysis_date_range")).as("hashtag_analysis_date_range"),
      clean(to_json(col("creator_pricing_metrics"))).as("creator_pricing_metrics"),
      clean(col("creator_pricing_metrics.estimated_roi")).as("estimated_roi"),
      clean(col("creator_pricing_metrics.impressions_visibility")).as("impressions_visibility"),
      cleanNum(col("creator_pricing_metrics.time_15_seconds")).as("time_15_seconds"),
      cleanNum(col("creator_pricing_metrics.time_30_seconds")).as("time_30_seconds"),
      cleanNum(col("creator_pricing_metrics.time_60_seconds")).as("time_60_seconds"),
      cleanNum(col("creator_pricing_metrics.time_1_to_5_minutes")).as("time_1_to_5_minutes"),
      cleanNum(col("creator_pricing_metrics.time_greater_than_5_minutes"))
        .as("time_greater_than_5_minutes"),
      translate(priceUsd, ",", " ").as("price_usd"),
      topCollabStr.as("top_collaboration"),
      topCollabLogo.as("top_collaboration_brand_logo"),
      clean(col("analyzed_date")).as("analyzed_date"),
      clean(col("scraped_date")).as("scraped_date"),
      lit("").as("source"),
      clean(to_json(struct(report.drop("creator_key").columns.map(col): _*)))
        .as("raw_analysis")): _*)
  }

  /** CSV sink (:313-321): header row, minimal quoting, one file. */
  def writeCsv(flat: DataFrame, path: String): Unit =
    flat.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("emptyValue", "").csv(path)

  /** Cells whose Python value is a `json.dumps(..., ensure_ascii=False)`
    * string — rendered byte-exact by [[PyJson.renderValueCompact]] from
    * the report struct at the given path ("" = the whole creator row). */
  private val pyJsonCells: Seq[(String, String)] = Seq(
    "sponsor_frequency" -> "partnership_data.sponsor_frequency",
    "personality_traits" -> "personality_traits",
    "profile_insights" -> "profile_insights",
    "niche_distribution" -> "niche_data.distribution",
    "niche_confidence_scores" -> "niche_data.confidence_scores",
    "creator_pricing_metrics" -> "creator_pricing_metrics",
    "raw_analysis" -> "")

  /** Byte-exact CSV sink: reproduces the reference artifact's
    * serialization — `csv.writer(..., quoting=QUOTE_MINIMAL)` over rows
    * whose string items had `,` → ` ` applied (jsontocsv_enhanced.py:
    * 310-321): CRLF row terminator, quotes only around cells containing
    * a quote char, doubled inner quotes, CPython json.dumps cells, and
    * Python int/float forms for the number-in-double cells.
    *
    * Driver-side single-file assembly is the CONTRACT (the reference
    * reads one analyzed.json and writes one CSV); [[writeCsv]] remains
    * the distributed sink. */
  def writeCsvPy(report: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types.StructType
    val flat = flatten(report)
    val flatSchema = flat.schema
    val flatRows = flat.queryExecution.executedPlan.executeCollect()
    val uIdx = flatSchema.fieldIndex("username")

    // report structs for the byte-exact JSON cells, keyed by username
    val rep = report.drop("creator_key")
    val repSchema = rep.schema
    val repRows = rep.queryExecution.executedPlan.executeCollect()
      .map(r => r.getString(repSchema.fieldIndex("username")) -> r).toMap

    // Python-int forms recovered from the stringified double cells:
    // round(0, 2) default paths print "0"; statistics.mean of ints
    // prints without ".0" when exact (PyJson.reportModes rationale)
    val intIfZero = Set("average_engagement_rate", "engagement_rate_overall",
      "consistency_score")
    val intIfWhole = Set("avg_sponsored_engagement", "avg_organic_engagement")

    def quoteCsv(cell: String): String =
      if (cell.exists(c => c == '"' || c == '\n' || c == '\r' || c == ','))
        "\"" + cell.replace("\"", "\"\"") + "\""
      else cell

    val names = flatSchema.fieldNames
    val sb = new StringBuilder(1 << 20)
    sb.append(names.mkString(",")).append("\r\n")
    flatRows.foreach { row =>
      val user = row.getString(uIdx)
      val repRow = repRows(user)
      val cells = names.indices.map { i =>
        val name = names(i)
        pyJsonCells.find(_._1 == name) match {
          case Some((_, "")) =>
            PyJson.renderValueCompact(repRow, repSchema, "").replace(",", " ")
          case Some((_, p)) =>
            val parts = p.split('.')
            var v: Any = repRow
            var dt: org.apache.spark.sql.types.DataType = repSchema
            parts.foreach { f =>
              val st = dt.asInstanceOf[StructType]
              val j = st.fieldIndex(f)
              val r = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
              v = if (r == null || r.isNullAt(j)) null else r.get(j, st.fields(j).dataType)
              dt = st.fields(j).dataType
            }
            PyJson.renderValueCompact(v, dt, p).replace(",", " ")
          case None =>
            val s = if (row.isNullAt(i)) "" else row.getString(i)
            if (intIfZero(name) && s == "0.0") "0"
            else if (intIfWhole(name) && s.matches("-?\\d+\\.0")) s.dropRight(2)
            else s
        }
      }
      sb.append(cells.map(quoteCsv).mkString(",")).append("\r\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
