package graft

import org.apache.spark.sql.SparkSession

/** Size guard for the two oracle-baseline queries whose bucket geometry
  * is intentionally pinned small enough for a DuckDB oracle to
  * enumerate — and therefore quadratic past its design size (SCALE.md
  * measured both at ~80-120× for 10× data). They stay in the
  * correctness suite at oracle scale; the bench/scale runners skip them
  * (with a logged reason) once the corpus outgrows the geometry, because
  * re-measuring a known asymptote costs ~100 s per row and the
  * scale-safe replacements (`sim_lsh_neardup_auto`,
  * `dd_simhash_hamming_k2`) cover that regime in the same suite.
  */
object PinnedBaselines {

  /** query -> (table it scans, max rows its pinned geometry is sized
    * for). Bounds sit between the oracle scales (sf0.1: 2 k embeddings /
    * 5 k documents — always measured) and the stress scale (sf1: 20 k /
    * 50 k — always skipped). */
  val designSize: Map[String, (String, Long)] = Map(
    "sim_lsh_neardup"    -> (("embeddings", 4096L)), // 3 planes = 8 buckets
    "sim_lsh_neardup6"   -> (("embeddings", 4096L)), // 6 planes = 64 buckets × 64/bucket
    "sim_semantic_dedup" -> (("embeddings", 4096L)), // k=8 cells pinned for the fit replay
    "dd_simhash_hamming" -> (("documents", 8192L)))  // 16-bit sig, 8-bit bands

  // TrieMap: bench/scale runners are single-threaded today, but the
  // guard is library-surface — lock-free thread safety costs nothing
  private val countCache = scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Some(reason) when `name` is a pinned baseline whose input at
    * `sfDir` exceeds its design size; None -> run it. */
  def skipReason(spark: SparkSession, sfDir: String, name: String): Option[String] =
    designSize.get(name).flatMap { case (table, bound) =>
      val n = countCache.getOrElseUpdate((sfDir, table), {
        // footer metadata first (zero scan, zero jobs) — the same
        // table-stats path the auto-sizing operators use
        graft.sources.Tables.footerRowCount(spark, sfDir, table).getOrElse {
          val t = table match {
            case "documents"  => graft.sources.Tables.documents(spark, sfDir)
            case "embeddings" => graft.sources.Tables.embeddings(spark, sfDir)
          }
          t.count()
        }
      })
      if (n > bound)
        Some(s"$name: pinned-geometry oracle baseline sized for <=$bound " +
          s"$table rows, corpus has $n — scale-safe variant covers this regime")
      else None
    }
}
