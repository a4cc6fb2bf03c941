package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar / string / regex / array / json functions — SURVEY.md §2.7
  * (O-37/38, O-56, O-62..O-74) in generic form over `documents`,
  * `customer` and `events`.
  *
  * Everything here is built-in expressions (regexp_extract_all, higher-
  * order filter/transform, explode) — fully inside whole-stage codegen,
  * no UDFs (SURVEY §2.9). Token explodes shuffle on (token) or (doc_id,
  * category), both high-cardinality keys; keyword dims are broadcast
  * literals.
  */
object TextFunctions {

  /** O-37/O-66 hashtag-style token counting (analyze_insta_enhanced.py:
    * 1590-1594): regex-extract tokens, count, top-10 (deterministic
    * tie-break on token). */
  def tokenTopK(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) >= 4)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    // sort+limit → TakeOrderedAndProject: per-partition partial top-10,
    // never a single-partition window over EVERY distinct token (the
    // distinct-token table is unbounded at corpus scale); the rank
    // window then runs over 10 rows
    val top = counts.orderBy(col("n").desc, col("tok").asc).limit(10)
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("tok").asc)))
      .select("rnk", "tok", "n")
      .orderBy("rnk")
  }

  /** O-38 mention counting w/ stop-word + length filter
    * (analyze_insta_enhanced.py:1596-1609). */
  def stopwordTokens(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "for")
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) >= 3 && !col("tok").isin(stop: _*))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    // same sort+limit shape as tokenTopK — no global-window sort
    val top = counts.orderBy(col("n").desc, col("tok").asc).limit(10)
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("tok").asc)))
      .select("rnk", "tok", "n")
      .orderBy("rnk")
  }

  /** O-46/O-56 keyword-category scoring + argmax niche
    * (analyze_insta_enhanced.py:962-1112): tokenize → broadcast keyword
    * dim join → weighted sum per (doc, category) → argmax. */
  def keywordNiche(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Seq(
      ("query", "join", 2), ("query", "filter", 2), ("query", "group", 1), ("query", "sort", 1),
      ("storage", "table", 2), ("storage", "column", 2), ("storage", "row", 1), ("storage", "batch", 1),
      ("perf", "fast", 2), ("perf", "slow", 2), ("perf", "big", 1), ("perf", "small", 1),
    ).toDF("category", "kw", "weight")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
    val scored = toks.join(broadcast(dim), col("tok") === col("kw"))
      .groupBy("doc_id", "category")
      .agg(sum(col("weight")).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("category").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("category").as("niche"), col("score").as("niche_score"))
      .orderBy("doc_id")
  }

  /** O-62/O-63 first-match regex cascade (email/phone extraction,
    * analyze_insta_enhanced.py:1623-1640,1680-1701): coalesce over
    * patterns tried in order, then normalize. */
  def extractCascade(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("extracted",
        coalesce(
          nullif(regexp_extract(col("text"), "(join [a-z]+)", 1), lit("")),
          nullif(regexp_extract(col("text"), "(scan [a-z]+)", 1), lit("")),
          lit("none")))
      .withColumn("extracted_norm", regexp_replace(col("extracted"), " ", "_"))
      .select("doc_id", "extracted", "extracted_norm")
      .orderBy("doc_id")

  /** O-64/O-72/O-22 name split + URL synthesis + sanitization
    * (analyze_insta_enhanced.py:1642-1653, jsontocsv_enhanced.py:310). */
  def nameSplitSynth(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("parts", split(col("c_name"), "#"))
      .withColumn("name_prefix", element_at(col("parts"), 1))
      .withColumn("id_num", element_at(col("parts"), 2).cast("long"))
      .withColumn("profile_url",
        concat(lit("https://example.com/u/"), col("id_num").cast("string")))
      .withColumn("clean_segment", translate(col("c_mktsegment"), ",", " "))
      .select("c_custkey", "name_prefix", "id_num", "profile_url", "clean_segment")
      .orderBy("c_custkey")

  /** O-73 JSON cell access (jsontocsv_enhanced.py:201-273 re-serialization
    * inverse): extract typed field from a JSON string column, aggregate. */
  def jsonGet(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
      .orderBy("event_type")

  /** O-74/O-50 top-k collected into a pipe-joined cell
    * (jsontocsv_enhanced.py:116,168-170): top-5 sources per language,
    * rank-ordered, " | "-joined. */
  def pipeJoinTopK(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("source").asc)
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .groupBy("lang")
      .agg(collect_list(struct(col("rnk"), col("source"))).as("tops"))
      .withColumn("top_sources",
        array_join(transform(array_sort(col("tops")), x => x.getField("source")), " | "))
      .select("lang", "top_sources")
      .orderBy("lang")
  }

  /** O-22 string sanitization + stable content hash
    * (jsontocsv_enhanced.py:310,97). */
  def sanitizeHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("clean",
        regexp_replace(translate(col("text"), ",", " "), "\\s+", " "))
      .select(col("doc_id"), md5(col("clean")).as("clean_hash"))
      .orderBy("doc_id")

  /** O-60/O-61/O-70/O-72 classification ladders + url synthesis
    * (analyze_insta_enhanced.py:1655-1678,1814-1852;
    * jsontocsv_enhanced.py:342-400): tier bucket from a numeric ladder,
    * type from keyword predicates, synthesized asset url. */
  def bucketLadder(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.sources.Tables.customer(spark, dir)
    c.select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit("Debtor"))
          .when(col("c_acctbal") < 1000, lit("Nano"))
          .when(col("c_acctbal") < 5000, lit("Micro"))
          .when(col("c_acctbal") < 8000, lit("Mid-Tier"))
          .otherwise(lit("Macro")).as("tier"),
        when(lower(col("c_mktsegment")).contains("build") ||
          lower(col("c_mktsegment")).contains("machine"), lit("industrial"))
          .when(lower(col("c_mktsegment")).contains("auto"), lit("consumer"))
          .otherwise(lit("general")).as("segment_type"),
        concat(lit("https://assets.example.com/"),
          lower(translate(col("c_mktsegment"), " ", "_")), lit("/"),
          col("c_custkey"), lit(".jpg")).as("asset_url"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_bucket_ladder"   -> bucketLadder _,
    "txt_token_topk"      -> tokenTopK _,
    "txt_stopword_tokens" -> stopwordTokens _,
    "txt_keyword_niche"   -> keywordNiche _,
    "txt_extract_cascade" -> extractCascade _,
    "txt_name_split_synth" -> nameSplitSynth _,
    "txt_json_get"        -> jsonGet _,
    "txt_pipe_join_topk"  -> pipeJoinTopK _,
    "txt_sanitize_hash"   -> sanitizeHash _,
  )

  val oracles: Map[String, String] = Map(
    "txt_bucket_ladder" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'Debtor'
                WHEN c_acctbal < 1000 THEN 'Nano'
                WHEN c_acctbal < 5000 THEN 'Micro'
                WHEN c_acctbal < 8000 THEN 'Mid-Tier'
                ELSE 'Macro' END AS tier,
           CASE WHEN contains(lower(c_mktsegment), 'build')
                  OR contains(lower(c_mktsegment), 'machine') THEN 'industrial'
                WHEN contains(lower(c_mktsegment), 'auto') THEN 'consumer'
                ELSE 'general' END AS segment_type,
           concat('https://assets.example.com/',
             replace(lower(c_mktsegment), ' ', '_'), '/', c_custkey, '.jpg') AS asset_url
         FROM customer ORDER BY c_custkey""",
    "txt_token_topk" ->
      """WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM t WHERE length(tok) >= 4 GROUP BY tok),
         r AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk FROM c)
         SELECT rnk, tok, n FROM r WHERE rnk <= 10 ORDER BY rnk""",
    "txt_stopword_tokens" ->
      """WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM t
               WHERE length(tok) >= 3 AND tok NOT IN ('the','a','and','for')
               GROUP BY tok),
         r AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk FROM c)
         SELECT rnk, tok, n FROM r WHERE rnk <= 10 ORDER BY rnk""",
    "txt_keyword_niche" ->
      """WITH dim(category, kw, weight) AS (VALUES
           ('query','join',2),('query','filter',2),('query','group',1),('query','sort',1),
           ('storage','table',2),('storage','column',2),('storage','row',1),('storage','batch',1),
           ('perf','fast',2),('perf','slow',2),('perf','big',1),('perf','small',1)),
         t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
         s AS (SELECT doc_id, category, CAST(sum(weight) AS BIGINT) AS score
               FROM t JOIN dim ON tok = kw GROUP BY doc_id, category),
         r AS (SELECT doc_id, category, score,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, category ASC) AS rnk
               FROM s)
         SELECT doc_id, category AS niche, score AS niche_score
         FROM r WHERE rnk = 1 ORDER BY doc_id""",
    "txt_extract_cascade" ->
      """SELECT doc_id,
           coalesce(nullif(regexp_extract(text, '(join [a-z]+)', 1), ''),
                    nullif(regexp_extract(text, '(scan [a-z]+)', 1), ''),
                    'none') AS extracted,
           regexp_replace(
             coalesce(nullif(regexp_extract(text, '(join [a-z]+)', 1), ''),
                      nullif(regexp_extract(text, '(scan [a-z]+)', 1), ''),
                      'none'), ' ', '_') AS extracted_norm
         FROM documents ORDER BY doc_id""",
    "txt_name_split_synth" ->
      """SELECT c_custkey,
           string_split(c_name, '#')[1] AS name_prefix,
           CAST(string_split(c_name, '#')[2] AS BIGINT) AS id_num,
           'https://example.com/u/' || CAST(CAST(string_split(c_name, '#')[2] AS BIGINT) AS VARCHAR) AS profile_url,
           replace(c_mktsegment, ',', ' ') AS clean_segment
         FROM customer ORDER BY c_custkey""",
    "txt_json_get" ->
      """SELECT event_type, count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "txt_pipe_join_topk" ->
      """WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
         r AS (SELECT lang, source, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, source ASC) AS rnk
               FROM c)
         SELECT lang, string_agg(source, ' | ' ORDER BY rnk) AS top_sources
         FROM r WHERE rnk <= 5 GROUP BY lang ORDER BY lang""",
    "txt_sanitize_hash" ->
      """SELECT doc_id,
           md5(regexp_replace(replace(text, ',', ' '), '\s+', ' ', 'g')) AS clean_hash
         FROM documents ORDER BY doc_id""",
  )
}
