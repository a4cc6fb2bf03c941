package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar-format breadth beyond parquet: ORC round-trip.
  *
  * The engine's tables live in parquet, but a lakehouse routinely hosts
  * ORC neighbors (Hive heritage) — and Spark's ORC source has the same
  * pushdown/pruning contract as parquet (vectorized reader, predicate
  * pushdown, column pruning via `ReadSchema`). The gated query writes a
  * projection of `documents` to ORC, reads it back, and aggregates; the
  * DuckDB oracle computes the same aggregate from the ORIGINAL parquet,
  * so a hash match proves the ORC sink+source preserved every value —
  * the round-trip IS the assertion. */
object Formats {

  /** Write-once ORC mirror of (doc_id, lang, n_chars); keyed like the
    * index tables so a regenerated corpus re-materializes. */
  private def orcMirror(spark: SparkSession, dir: String): String = {
    val path = new java.io.File(
      s"target/orc/docs_${IndexStore.keyOf(dir)}").getAbsolutePath
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.documents(spark, dir)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").orc(path)
    }
    path
  }

  /** Per-language accounting read from the ORC mirror — hash-gated
    * against DuckDB over the original parquet (`rel_orc_roundtrip`). */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(orcMirror(spark, dir))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang")
}
