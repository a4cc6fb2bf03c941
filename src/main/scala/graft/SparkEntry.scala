package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.{CorpusOps, TextAnalysis, TextFunctions, WebOps}
import graft.operators.{Aggregations, Dedup, Graph, Maintenance, Multimodal, Relational, Sampling, Similarity, Skew, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (names are stable across rounds); `oracleSql` holds the equivalent
  * DuckDB SQL for the driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary (SURVEY §2.4 O-28/O-29). Uses only
    * ms-precision parquet, so it is safe under a default driver session. */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Graph.queries ++ Maintenance.queries ++ Aggregations.queries ++ Windows.queries ++
      TextFunctions.queries ++ TextAnalysis.queries ++ CorpusOps.queries ++ WebOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ Skew.queries ++ Sampling.queries ++
      graft.ig.SynthIg.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Graph.oracles ++ Maintenance.oracles ++ Aggregations.oracles ++ Windows.oracles ++
      TextFunctions.oracles ++ TextAnalysis.oracles ++ CorpusOps.oracles ++ WebOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ Skew.oracles ++ Sampling.oracles ++
      graft.ig.SynthIg.oracles
}
