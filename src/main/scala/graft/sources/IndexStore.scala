package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-or-build persistence for derived "index" tables — the build-once
  * lifecycle of every signature/band/assignment artifact a 100 TB
  * pipeline derives from a corpus: MinHash band tables, byte-gram
  * signatures, IVF assignments. Deriving them inline makes every query
  * re-pay the full derivation; a real deployment materializes them at
  * ingest and appends per batch.
  *
  * `orBuild` resolves in three steps, cheapest first:
  *  1. session-catalog hit → zero work, read the stored bucketed table;
  *  2. catalog miss but the table's files exist on disk with a matching
  *     `_graft_meta.json` sidecar (buckets + keys recorded at build
  *     time) → re-REGISTER the existing files as an external bucketed
  *     table (`CREATE TABLE … CLUSTERED BY … LOCATION`) — metadata-only,
  *     the build closure is never evaluated, so "build once" holds
  *     ACROSS sessions, not just within one;
  *  3. neither → build the frame, write it bucketed
  *     ([[Bucketing.writeBucketed]] — the bucketing rides into every
  *     downstream join/agg on the key columns), register it, and drop
  *     the sidecar for the next session.
  * Tables are keyed by a corpus key ([[keyOf]]: source directory path +
  * file inventory), so distinct corpora — including the SAME path after
  * an in-place regeneration — never share an index. A
  * sidecar that disagrees with the requested geometry (bucket count or
  * key set changed between code versions) fails the match and the index
  * is rebuilt — a stale layout can degrade to a rebuild, never to wrong
  * bucketing metadata.
  */
object IndexStore {

  /** Stable index-table key for a corpus directory: path PLUS the
    * directory's file inventory (name, length, mtime per file). Now that
    * indexes survive session boundaries, a path-only key would serve a
    * STALE index after the corpus at that path is regenerated in place —
    * exactly what the driver does to /root/testdata between rounds. A
    * changed inventory changes the key, orphaning the old index and
    * forcing a rebuild; the equivalent of a catalog's table version.
    * Listing a directory is metadata-only (no data read), negligible
    * against any index build or scan. */
  def keyOf(dir: String): String = {
    val f = new java.io.File(dir)
    val inventory =
      if (!f.isDirectory) ""
      else f.listFiles().sortBy(_.getName)
        .map(x => s"${x.getName}:${x.length}:${x.lastModified}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir#$inventory".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  private def metaJson(buckets: Int, keys: Seq[String]): String =
    s"""{"buckets":$buckets,"keys":"${keys.mkString(",")}"}"""

  /** Metadata-only re-registration of previously-built index files.
    * Underscore-prefixed sidecars are invisible to the parquet scan. */
  private def registerExisting(spark: SparkSession, name: String, path: String,
                               buckets: Int, keys: Seq[String]): Boolean =
    try {
      val meta    = new java.io.File(path, "_graft_meta.json")
      val success = new java.io.File(path, "_SUCCESS")
      if (!meta.exists() || !success.exists()) false
      else if (new String(java.nio.file.Files.readAllBytes(meta.toPath), "UTF-8").trim
                 != metaJson(buckets, keys)) false
      else {
        val schema = spark.read.parquet(path).schema
        val ks = keys.map(k => s"`$k`").mkString(", ")
        spark.sql(
          s"""CREATE TABLE `$name` (${schema.toDDL}) USING parquet
             |CLUSTERED BY ($ks) SORTED BY ($ks) INTO $buckets BUCKETS
             |LOCATION '$path'""".stripMargin)
        true
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The catalog-or-disk-or-build read: returns `name` as a DataFrame,
    * building and persisting it (bucketed by `keys` into `buckets`) only
    * when no session has built it before. */
  def orBuild(spark: SparkSession, name: String, buckets: Int, keys: Seq[String])
             (build: => DataFrame): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      val path = new java.io.File(s"target/index/$name").getAbsolutePath
      if (!registerExisting(spark, name, path, buckets, keys)) {
        Bucketing.writeBucketed(build, name, path, buckets, keys)
        try java.nio.file.Files.write(
          java.nio.file.Paths.get(path, "_graft_meta.json"),
          metaJson(buckets, keys).getBytes("UTF-8"))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    spark.table(name)
  }
}
