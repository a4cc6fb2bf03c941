package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Det._

/** Skew mitigation — two-phase salted aggregation (builder brief: "skewed
  * keys → salting or AQE skew-join").
  *
  * A hot key that would pin one reducer is split across `nSalts`
  * sub-partitions in phase 1 (groupBy(key, salt) — the salt spreads one
  * key over many tasks), then the tiny per-salt partials are combined in
  * phase 2 (groupBy(key)). Phase-2 input is at most
  * |distinct keys| × nSalts rows, so its shuffle is negligible. The
  * result is identical to the direct aggregation — only the shuffle
  * distribution changes — which is exactly what the DuckDB oracle
  * asserts. AQE's skew-join splitting handles the join-side analogue
  * (enabled in [[graft.Sessions]]).
  */
object Skew {

  /** Algebraic salted sum/count over (df, key): two-phase, identical
    * semantics to a direct groupBy. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     nSalts: Int): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("psum"),
        count(lit(1)).as("pcnt"))
    phase1.groupBy("k")
      .agg(sum(col("psum")).as("ssum"), sum(col("pcnt")).as("n"))
  }

  /** Oracle-gated query: salted revenue per event user — hash-identical
    * to DuckDB's plain GROUP BY because salting is semantics-preserving. */
  def saltedUserRevenue(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(Tables.events(spark, dir), col("user_id"), col("value"), nSalts = 16)
      .select(col("k").as("user_id"),
        col("ssum").cast("double").as("total_value"), col("n"))
      .orderBy("user_id")

  /** SALTED SKEW JOIN — the join-side sibling of [[saltedSumCount]],
    * spelled out as an explicit operator (AQE's skew-join split only
    * fires on sort-merge partitions past size thresholds; a pipeline
    * needs the technique available deterministically):
    *
    *  1. detect hot keys at runtime from exact fact-side counts (one
    *     partial-agg shuffle whose output is |distinct keys| rows;
    *     threshold = keys holding > 1/20 of the fact rows);
    *  2. fact side: hot rows get a salt in [0, nSalts) (cold rows salt
    *     0), splitting each hot key across nSalts reducers;
    *  3. dim side: hot-key rows REPLICATE to all nSalts salts (cold
    *     rows once) — replication cost is |hot keys|·nSalts rows, not
    *     a corpus blow-up;
    *  4. equi-join on (key, salt) — semantics identical to the plain
    *     key join, which is exactly what the DuckDB oracle asserts.
    *
    * The fact stream is the events table with ~30% of rows folded onto
    * one key (the synthetic hot key a real log's power-law head
    * produces); the dim side is customer. The dim side takes a
    * shuffle_hash hint: at test scale Catalyst would broadcast it and
    * no skew could exist — at 100 TB dims outgrow broadcast, and the
    * hinted shuffled join is the plan whose skew this operator solves. */
  def saltedSkewJoin(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame = {
    val fact = Tables.events(spark, dir).select(
      when(col("user_id") % 7 < 2, 1L).otherwise(col("user_id")).as("k"),
      col("value"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
    val total = fact.agg(count(lit(1)).as("total"))
    val hot = fact.groupBy("k").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 20 > col("total"))
      .select(col("k"), lit(true).as("is_hot"))
    val saltedFact = fact
      .join(broadcast(hot), Seq("k"), "left")
      .withColumn("salt",
        when(col("is_hot"), pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
          .otherwise(lit(0L)))
      .select("k", "salt", "value")
    val saltedDim = dim
      .join(broadcast(hot), Seq("k"), "left")
      .withColumn("salt", explode(
        when(col("is_hot"), sequence(lit(0L), lit(nSalts.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .select("k", "salt", "segment")
    saltedFact
      .join(saltedDim.hint("shuffle_hash"), Seq("k", "salt"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("total_value"))
      .orderBy("segment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_salted_sum"       -> saltedUserRevenue _,
    "rel_skew_join_salted" -> ((s: SparkSession, d: String) => saltedSkewJoin(s, d)))

  val oracles: Map[String, String] = Map(
    "agg_salted_sum" ->
      """SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""",
    // the oracle states the SEMANTICS (plain key join); salting is the
    // engine-side shuffle-distribution strategy under test
    "rel_skew_join_salted" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS n_rows,
           CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM (SELECT CASE WHEN user_id % 7 < 2 THEN 1 ELSE user_id END AS k, value
               FROM events) f
         JOIN customer c ON f.k = c.c_custkey
         GROUP BY 1 ORDER BY 1""")
}
