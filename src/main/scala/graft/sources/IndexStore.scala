package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-or-build persistence for derived "index" tables — the build-once
  * lifecycle of every signature/band/assignment artifact a 100 TB
  * pipeline derives from a corpus: MinHash band tables, byte-gram
  * signatures, IVF assignments. Deriving them inline makes every query
  * re-pay the full derivation; a real deployment materializes them at
  * ingest and appends per batch.
  *
  * `orBuild` checks the session catalog first: a hit means ZERO build
  * work (the query reads the stored bucketed table); a miss builds the
  * frame once, writes it bucketed ([[Bucketing.writeBucketed]] — the
  * bucketing rides into every downstream join/agg on the key columns),
  * and registers it. Tables are keyed by a content-independent corpus
  * key ([[keyOf]] the source directory), so distinct corpora never
  * share an index and re-running against the same corpus in one session
  * is free. A fresh session rebuilds — the deterministic build makes
  * that a correctness no-op, only a warm-up cost.
  */
object IndexStore {

  /** Stable index-table key for a corpus directory. */
  def keyOf(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** The catalog-or-build read: returns `name` as a DataFrame, building
    * and persisting it (bucketed by `keys` into `buckets`) on first use
    * in this session. */
  def orBuild(spark: SparkSession, name: String, buckets: Int, keys: Seq[String])
             (build: => DataFrame): DataFrame = {
    if (!spark.catalog.tableExists(name))
      Bucketing.writeBucketed(build, name,
        new java.io.File(s"target/index/$name").getAbsolutePath, buckets, keys)
    spark.table(name)
  }
}
