package graft.ig

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP-1's relational surface — SURVEY §2.1 O-1/O-2/O-9/O-10 and §2.2
  * O-15, faithful to insta_scraper_enhanced.py:474-509 (load_urls),
  * :137-142 (get_username), :363-379 (done-log append), :594-595
  * (noResponse channel). The scraping transport itself is out of scope
  * (SURVEY §0); these are the operators around it.
  */
object Ingest {

  /** `url.strip().rstrip('/')` (:493,497). */
  def normalizeUrl(c: Column): Column = rtrim(trim(c), "/")

  /** get_username (:137-142): last path segment, query stripped. */
  def usernameFromUrl(c: Column): Column =
    element_at(split(element_at(split(normalizeUrl(c), "/"), -1), "\\?"), 1)

  /** O-1 CSV scan of the url list. */
  def readUrls(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** load_urls resume (:474-509): original (un-normalized) input urls
    * whose NORMALIZED form is not in the normalized done set — a
    * left-anti equi-join, order-preserving via the input's row identity. */
  def urlsToProcess(input: DataFrame, done: DataFrame): DataFrame = {
    val d = done.select(normalizeUrl(col("url")).as("url_norm")).distinct()
    input.withColumn("url_norm", normalizeUrl(col("url")))
      .join(d, Seq("url_norm"), "left_anti")
      .drop("url_norm")
  }

  /** O-10 done-log append (:363-379): idempotent completion record. */
  def appendDone(processed: DataFrame, doneLogPath: String): Unit =
    processed.select(col("url")).write.mode("append")
      .option("header", "true").csv(doneLogPath)

  /** O-9 failure channel (:594-595): urls with no captured response. */
  def failedUrls(results: DataFrame): DataFrame =
    results.filter(!coalesce(col("success"), lit(false))).select("url")

  /** O-75 dynamic-wait complexity term (calculate_dynamic_wait_time,
    * insta_scraper_enhanced.py:170-187): `min(followers/500k + posts/5k,
    * 1.0)` seconds on top of a random 1–2 s base (the base is transport
    * randomness, not semantics). Quirk preserved in documentation only:
    * the reference reads the pre-2022 GraphQL keys (`edge_followed_by`,
    * `edge_owner_to_timeline_media`) which the schema it itself saves
    * does not contain, so on its own data the term is always 0 — a dead
    * path like O-17; the formula is implemented here over the real
    * profile columns. */
  def politenessWait(followers: Column, posts: Column): Column =
    least(followers.cast("double") / 500000.0 + posts.cast("double") / 5000.0, lit(1.0))
}
