package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TopKByScore
import graft.sources.Tables

/** Deterministic sampling — the eval-set / subset-selection operators of
  * a corpus pipeline. Random sampling is useless for an oracle-gated,
  * resumable engine: both variants here derive membership from a content
  * hash, so every engine (and every re-run) draws the identical sample.
  *
  *  - Per-key reservoir: EXACTLY k docs per stratum, the equivalent of
  *    a per-key reservoir sample with the hash as the priority (the
  *    classic bottom-k / priority-sampling trick: a uniform hash order
  *    is a uniform permutation, so top-k by hash IS a uniform k-sample).
  *    Runs on the bounded [[TopKByScore]] typed aggregation — the
  *    map-side hash table holds ≤ k rows per (stratum, mapper), so the
  *    exchange carries ≤ k·mappers rows per stratum, never the corpus.
  *  - Stratified proportional: a global budget B allocated across
  *    strata as floor(B·n_h/N) with membership by cross-multiplied
  *    INTEGER arithmetic on the hash bucket (no float rates — both
  *    engines agree bit-for-bit). One tiny per-stratum count broadcast
  *    + a map-side filter; the corpus never shuffles.
  *
  * Scale notes: both are one scan + one bounded/broadcast exchange.
  * The window form (`row_number() over (partition by stratum order by
  * hash)`) — which the ORACLE uses — would shuffle every row to its
  * stratum; the reservoir form is why these stay linear at 100 TB.
  */
object Sampling {

  /** The shared deterministic priority: first 8 md5-hex chars of the
    * doc id as an integer — uniform in [0, 2^32), exact in a double,
    * and reproducible in any engine with md5. */
  private val prioritySql =
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"

  /** Per-stratum exact-k deterministic reservoir over the documents
    * table: the k docs with the highest hash priority per source. */
  def samplePerKey(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    samplePerKeyOf(Tables.documents(spark, dir), k)

  /** [[samplePerKey]] over any (doc_id, source) frame (spec entry). */
  def samplePerKeyOf(docs: DataFrame, k: Int): DataFrame =
    TopKByScore.serveTopK(
      docs.withColumn("priority", expr(prioritySql).cast("double")),
      "source", col("priority"), col("doc_id"), k)
      .select(col("source"), col("rnk"), col("key").as("doc_id"),
        col("score").as("priority"))
      .orderBy("source", "rnk")

  /** Stratified proportional sample: budget B split across languages as
    * floor(B·n_h/N); doc d of stratum h is kept iff
    * bucket(d)·n_h < 10000·alloc_h — the same cross-multiply contract
    * as the domain-mix cap, here with a per-stratum PROPORTIONAL
    * allocation instead of a uniform ceiling. Emits the row-level
    * sample (strongest hash gate), tagged with the stratum size and
    * allocation so the rate is auditable per row. */
  def stratifiedSample(spark: SparkSession, dir: String, budget: Long = 120L): DataFrame =
    stratifiedSampleOf(Tables.documents(spark, dir), budget)

  /** [[stratifiedSample]] over any (doc_id, lang) frame (spec entry). */
  def stratifiedSampleOf(docs: DataFrame, budget: Long): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val total = docs.agg(count(lit(1)).as("total"))
    docs.select("doc_id", "lang")
      .withColumn("bucket", expr(
        "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 10000)"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(total))
      .withColumn("alloc", expr(s"($budget * n_docs) div total"))
      .filter(col("bucket") * col("n_docs") < lit(10000L) * col("alloc"))
      .select(col("doc_id"), col("lang"), col("n_docs"), col("alloc"))
      .orderBy("doc_id")
  }

  /** WEIGHTED deterministic sampling — priority sampling (Duffield/
    * Lund/Thorup): item priority = weight / u where u is the item's
    * uniform hash; the global top-k by priority is a size-biased
    * sample WITHOUT replacement (long documents proportionally more
    * likely, the standard token-weighted eval-draw). Deterministic and
    * engine-exact: u is the integer md5 prefix, the weight is an
    * integer column, and one IEEE double division of two exact
    * integers rounds identically everywhere — no ln/pow in the gate.
    * Same bounded [[TopKByScore]] shape as [[samplePerKeyOf]]: ≤ k
    * rows per mapper cross the wire, never the corpus. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    weightedSampleOf(Tables.documents(spark, dir), k)

  /** [[weightedSample]] over any (doc_id, n_chars) frame (spec entry). */
  def weightedSampleOf(docs: DataFrame, k: Int): DataFrame =
    TopKByScore.serveTopK(
      docs.withColumn("priority",
        col("n_chars").cast("double") / (expr(prioritySql) + lit(1L)).cast("double"))
        .withColumn("g", lit(0)),
      "g", col("priority"), col("doc_id"), k)
      .select(col("rnk"), col("key").as("doc_id"), col("score").as("priority"))
      .orderBy("rnk")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_sample_per_key"    -> ((s: SparkSession, d: String) => samplePerKey(s, d)),
    "ta_stratified_sample" -> ((s: SparkSession, d: String) => stratifiedSample(s, d)),
    "ta_weighted_sample"   -> ((s: SparkSession, d: String) => weightedSample(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // the oracle uses the window form the Scaladoc warns about — correct
    // at oracle scale, and exactly the cross-check the reservoir needs
    "ta_sample_per_key" ->
      """WITH p AS (
           SELECT source, doc_id,
                  CAST(list_reduce([strpos('0123456789abcdef', c) - 1
                       FOR c IN string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
                      (a, v) -> a * 16 + v) AS DOUBLE) AS priority
           FROM documents),
         r AS (
           SELECT source, doc_id, priority,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY priority DESC, doc_id) AS rnk
           FROM p)
         SELECT source, CAST(rnk AS INTEGER) AS rnk, doc_id, priority
         FROM r WHERE rnk <= 20 ORDER BY source, rnk""",
    "ta_stratified_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         t AS (SELECT count(*) AS total FROM documents),
         b AS (SELECT d.doc_id, d.lang, c.n_docs,
                 (120 * c.n_docs) // t.total AS alloc,
                 list_reduce([strpos('0123456789abcdef', ch) - 1
                      FOR ch IN string_split(substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8), '')],
                     (a, v) -> a * 16 + v) % 10000 AS bucket
               FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN t)
         SELECT doc_id, lang, n_docs, CAST(alloc AS BIGINT) AS alloc
         FROM b WHERE bucket * n_docs < 10000 * alloc
         ORDER BY doc_id""",
    "ta_weighted_sample" ->
      """WITH p AS (
           SELECT doc_id,
             CAST(n_chars AS DOUBLE)
               / CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1
                      AS DOUBLE) AS priority
           FROM documents),
         r AS (
           SELECT doc_id, priority,
                  row_number() OVER (ORDER BY priority DESC, doc_id) AS rnk
           FROM p)
         SELECT CAST(rnk AS INTEGER) AS rnk, doc_id, priority
         FROM r WHERE rnk <= 25 ORDER BY rnk""",
  )
}
