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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_salted_sum" -> saltedUserRevenue _)

  val oracles: Map[String, String] = Map(
    "agg_salted_sum" ->
      """SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""")
}
