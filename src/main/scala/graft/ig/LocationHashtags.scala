package graft.ig

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Location analysis + 90-day hashtag/mention extraction — SURVEY §2.4
  * O-37/O-38/O-42/O-43, §2.7 O-67/O-68, faithful to
  * analyze_insta_enhanced.py:92-242 (analyze_location_data) and
  * :1545-1621 (extract_hashtags_and_mentions).
  *
  * Order semantics: Counter/dict iteration order in the reference is
  * first-insertion order and `most_common`/stable-sort tie-breaks favor
  * earlier insertion, so every top-k here carries a first-occurrence
  * (ordinal, position) key. Python-set outputs (location_hashtags) have
  * no defined order — we emit them sorted.
  *
  * Scale: one groupBy per output family on the creator key; top-k via
  * bounded windows; maps are bounded (≤24 hour keys, top-10 lists).
  */
object LocationHashtags {

  // ------------------------------------------------------------ location

  private val locationHashtagRe =
    "^(.*city|.*town|.*beach|.*park|.*street|.*travel|.*trip|.*vacation|.*holiday|nyc|la|sf|london|paris|tokyo|miami|vegas|chicago|boston)$"

  /** analyze_location_data (:92-242). One row per creator.
    * `usCities` is the broadcast city dimension; the shipped DB is broken
    * JSON so the reference always runs with an empty one (SURVEY §1.1) —
    * pass None to replicate. */
  def locationAnalysis(posts: DataFrame, clock: IgClock,
                       usCities: Option[DataFrame] = None): DataFrame = {
    // per-post location candidates in insertion order:
    // location.name first, then capitalized caption words (:110-160)
    val cands = posts.select(col("creator_key"), col("ordinal"),
      posexplode(concat(
        expr("CASE WHEN location IS NOT NULL AND location.name IS NOT NULL " +
          "AND location.name != '' THEN array(location.name) ELSE array() END"),
        expr("regexp_extract_all(coalesce(caption_text, ''), " +
          "'\\\\b([A-Z][a-z]{2,}(?:\\\\s+[A-Z][a-z]{2,})?)\\\\b', 1)"))))
      .select(col("creator_key"), col("ordinal"), col("pos"),
        expr("trim(col)").as("loc"))
      .filter(col("loc") =!= "")

    val locCounts = cands.groupBy("creator_key", "loc").agg(
      count(lit(1)).as("n"),
      min(struct(col("ordinal"), col("pos"))).as("first_seen"))

    val wFirst = Window.partitionBy("creator_key")
      .orderBy(col("first_seen.ordinal"), col("first_seen.pos"))

    // the reference counts over the ALREADY-DEDUPED list (:180-186):
    // `Counter(normalized_locations)` where normalized_locations has been
    // dedup'd — every count is 1, so most_common(10) ≡ first 10 in
    // insertion order
    val locAgg = locCounts
      .withColumn("ins_rank", row_number().over(wFirst))
      .withColumn("top_rank", col("ins_rank"))
      .groupBy("creator_key").agg(
        expr("transform(array_sort(collect_list(struct(ins_rank, loc))), r -> r.loc)")
          .as("location_tags"),
        expr("transform(array_sort(collect_list(CASE WHEN top_rank <= 10 " +
          "THEN struct(top_rank, loc) END)), r -> r.loc)")
          .as("most_visited_locations"),
        count(lit(1)).as("travel_frequency"))
      .withColumn("location_diversity_score",
        least(lit(100L), col("travel_frequency") * 5))

    // matched_us_cities: first city (dim order) whose name equals / prefixes
    // / is contained in the location, per distinct location in insertion
    // order (:197-218). With no dim (the shipped reality) → empty.
    val matched = usCities match {
      case Some(cities) =>
        val cityDim = cities.select(
          lower(coalesce(col("city"), lit(""))).as("entry_name"),
          coalesce(col("state_id"), lit("")).as("entry_state"),
          monotonically_increasing_id().as("city_ord"))
          .filter(col("entry_name") =!= "")
        val lower_loc = lower(col("loc"))
        val hits = locCounts.join(broadcast(cityDim),
          lower_loc === col("entry_name") ||
            lower_loc.startsWith(col("entry_name")) ||
            col("entry_name").contains(lower_loc))
          .withColumn("rn", row_number().over(Window
            .partitionBy("creator_key", "loc").orderBy("city_ord")))
          .filter(col("rn") === 1)
        hits.withColumn("ins_rank", row_number().over(wFirst))
          .groupBy("creator_key").agg(
            expr("transform(array_sort(collect_list(struct(ins_rank, " +
              "struct(loc as input_location, entry_name as matched_city, " +
              "entry_state as state)))), r -> r.col2)").as("matched_us_cities"))
      case None =>
        posts.select("creator_key").distinct().withColumn("matched_us_cities",
          expr("cast(array() as array<struct<input_location:string," +
            "matched_city:string,state:string>>)"))
    }

    // location_hashtags: lowercased #\w+ tags matching the 18 location
    // patterns; Python-set output → sorted for determinism (:139-160)
    val hashtagAgg = posts.select(col("creator_key"),
      explode(expr("regexp_extract_all(lower(coalesce(caption_text, '')), '#(\\\\w+)', 1)"))
        .as("tag"))
      .filter(col("tag").rlike(locationHashtagRe))
      .groupBy("creator_key")
      .agg(array_sort(array_distinct(collect_list(col("tag")))).as("location_hashtags"))

    // posting-hour histogram + timezone estimate (:162-241)
    val hours = posts
      .filter(coalesce(col("taken_at"), lit(0L)) =!= 0)
      .withColumn("h", clock.localHour(col("taken_at")))
      .groupBy("creator_key", "h")
      .agg(count(lit(1)).as("n_h"), min(col("ordinal")).as("first_ord"))
    val wHour = Window.partitionBy("creator_key")
      .orderBy(col("n_h").desc, col("first_ord"))
    val hourAgg = hours
      .withColumn("rk", row_number().over(wHour))
      .groupBy("creator_key").agg(
        // Counter(posting_times) keeps first-occurrence order (:222-223)
        map_from_entries(expr(
          "transform(array_sort(collect_list(struct(first_ord, " +
            "struct(cast(h as string) as k, n_h as v) as e))), x -> x.e)"))
          .as("posting_timezone_pattern"),
        avg(when(col("rk") <= 5, col("h"))).as("avg_top5_hour"))
      .withColumn("timezone_estimate",
        when(col("avg_top5_hour").between(6, 10),
          lit("Morning poster (likely local timezone)"))
          .when(col("avg_top5_hour").between(11, 15),
            lit("Afternoon poster (likely local timezone)"))
          .when(col("avg_top5_hour").between(16, 22),
            lit("Evening poster (likely local timezone)"))
          .otherwise(lit("Night poster (possible different timezone)")))

    posts.select("creator_key").distinct()
      .join(locAgg, Seq("creator_key"), "left")
      .join(matched, Seq("creator_key"), "left")
      .join(hashtagAgg, Seq("creator_key"), "left")
      .join(hourAgg, Seq("creator_key"), "left")
      .withColumn("location_tags",
        coalesce(col("location_tags"), expr("array()").cast("array<string>")))
      .withColumn("most_visited_locations",
        coalesce(col("most_visited_locations"), expr("array()").cast("array<string>")))
      .withColumn("travel_frequency", coalesce(col("travel_frequency"), lit(0L)))
      .withColumn("location_diversity_score",
        coalesce(col("location_diversity_score"), lit(0L)))
      .withColumn("location_hashtags",
        coalesce(col("location_hashtags"), expr("array()").cast("array<string>")))
      .withColumn("matched_us_cities", coalesce(col("matched_us_cities"),
        expr("cast(array() as array<struct<input_location:string," +
          "matched_city:string,state:string>>)")))
      .withColumn("posting_timezone_pattern", coalesce(col("posting_timezone_pattern"),
        expr("map()").cast("map<string,bigint>")))
      .withColumn("timezone_estimate",
        coalesce(col("timezone_estimate"), lit("Unknown")))
      .select("creator_key", "location_tags", "location_hashtags",
        "most_visited_locations", "timezone_estimate", "posting_timezone_pattern",
        "travel_frequency", "location_diversity_score", "matched_us_cities")
  }

  // ----------------------------------------------------------- hashtags

  private val mentionStopwords = Seq("the", "and", "for", "from", "with", "this",
    "that", "have", "has", "her", "his", "our", "my", "your", "their", "its",
    "as", "at", "by", "to", "in", "on", "of", "or", "if")

  /** extract_hashtags_and_mentions (:1545-1621). One row per creator:
    * top-10 hashtag and mention count maps over the last 90 days, plus
    * the analyzed-post count and date-range label. */
  def hashtagsMentions(posts: DataFrame, clock: IgClock, limit: Int = 10): DataFrame = {
    val cutoff = clock.cutoff(90)
    // a null taken_at raises TypeError in `taken_at < cutoff` and skips
    // the post (:1573-1576); a missing one defaults to 0 → also skipped
    val recent = posts.filter(col("taken_at").isNotNull && col("taken_at") >= cutoff)

    val counts = posts.select("creator_key").distinct()
      .join(recent.groupBy("creator_key")
        .agg(count(lit(1)).as("posts_analyzed_for_hashtags")),
        Seq("creator_key"), "left")
      .withColumn("posts_analyzed_for_hashtags",
        coalesce(col("posts_analyzed_for_hashtags"), lit(0L)))

    val sw = mentionStopwords.map(s => s"'$s'").mkString(",")
    val tagArr = "regexp_extract_all(lower(coalesce(caption_text, '')), '#([A-Za-z0-9_]+)', 1)"
    val menArr = "filter(regexp_extract_all(coalesce(caption_text, ''), '@([A-Za-z0-9._]+)', 1), " +
      s"m -> length(m) >= 3 AND lower(m) NOT IN ($sw))"

    def top(df: DataFrame, arrExpr: String, lowered: Boolean, out: String): DataFrame = {
      val items = df.select(col("creator_key"), col("ordinal"), posexplode(expr(arrExpr)))
        .withColumn("key", if (lowered) col("col") else lower(col("col")))
      val grouped = items.groupBy("creator_key", "key").agg(
        count(lit(1)).as("n"),
        min(struct(col("ordinal"), col("pos"))).as("first_seen"))
      val w = Window.partitionBy("creator_key")
        .orderBy(col("n").desc, col("first_seen.ordinal"), col("first_seen.pos"))
      grouped.withColumn("rk", row_number().over(w)).filter(col("rk") <= limit)
        .groupBy("creator_key")
        .agg(map_from_entries(expr(
          "transform(array_sort(collect_list(struct(rk, struct(key, n)))), r -> r.col2)"))
          .as(out))
    }

    counts
      .join(top(recent, tagArr, lowered = true, "hashtags_last_90_days"),
        Seq("creator_key"), "left")
      .join(top(recent, menArr, lowered = false, "mentions_last_90_days"),
        Seq("creator_key"), "left")
      .withColumn("hashtags_last_90_days", coalesce(col("hashtags_last_90_days"),
        expr("map()").cast("map<string,bigint>")))
      .withColumn("mentions_last_90_days", coalesce(col("mentions_last_90_days"),
        expr("map()").cast("map<string,bigint>")))
      .withColumn("hashtag_analysis_date_range",
        lit(s"${clock.cutoffStr(90)} to ${clock.todayStr}"))
  }
}
