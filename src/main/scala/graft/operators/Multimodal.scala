package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal (binary) column plumbing (builder brief): images/audio/video
  * are opaque `binary` columns plus typed metadata; decode / feature
  * extraction runs per-partition over batches.
  *
  * The container has no codec libraries, so [[decodeStub]] is a
  * clearly-marked deterministic fake — the Spark-side contract (schema,
  * binary handling, per-partition batching, deterministic output) is the
  * real, tested part. At scale: binary payloads ride in their own column
  * (parquet keeps them out of unrelated scans via column pruning), and
  * decode parallelism is per-partition with no shuffle.
  */
object Multimodal {

  /** Materialize a binary column + metadata from text payloads —
    * stand-in for reading image/audio bytes (`binaryFile` format in
    * production; reference stores profile JPEGs per creator,
    * insta_scraper_enhanced.py:395-432). */
  def binaryized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_type", lit("text/plain"))

  /** O-11 real binary ingestion: one profile JPEG per creator directory
    * (reference insta_scraper_enhanced.py:395-432 stores
    * `output/<user>/<user>.jpg`). `binaryFile` is the production path for
    * opaque media: the scan carries (path, length, content) and prunes
    * `content` when only metadata is selected. The creator key comes from
    * the directory name, mirroring [[graft.ig.Instagram]]'s layout. */
  def profilePictures(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .load(s"$root/*")
      .select(
        regexp_extract(col("path"), ".*/([^/]+)/[^/]+\\.jpg$", 1).as("creator_key"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("sha256"),
        lower(hex(expr("substring(content, 1, 4)"))).as("magic_hex"),
        col("content").as("payload"))

  /** O-11 binary SINK: write each creator's payload to
    * `outDir/<creator>/<creator>.jpg` — the reference's storage layout
    * (insta_scraper_enhanced.py:395-432, chunked write per creator).
    * Executed with foreachPartition so executors write their partitions
    * in parallel and nothing funnels through the driver; with the
    * [[profilePictures]] scan this closes the binary round-trip
    * (scan → transform → store). Idempotent: rewriting a creator's file
    * overwrites it, so task retries are safe. */
  def writeProfilePictures(df: DataFrame, outDir: String): Unit =
    df.select("creator_key", "payload").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val creator = r.getString(0)
          val d = new java.io.File(outDir, creator)
          d.mkdirs()
          java.nio.file.Files.write(
            new java.io.File(d, s"$creator.jpg").toPath, r.getAs[Array[Byte]](1))
        }
    }

  /** Oracle-checkable binary metadata extraction: byte length, SHA-256,
    * leading-bytes signature ("magic number" probe). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    binaryized(spark, dir)
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        lower(hex(expr("substring(payload, 1, 4)"))).as("magic_hex"))
      .orderBy("doc_id")

  /** Decode step. JPEG payloads get REAL dimensions — parsed from the
    * SOF segment header by the codegen'd [[graft.functions.JpegDims]]
    * expression (pure byte-walking, ITU T.81 §B.2.2; no codec library
    * needed). Non-JPEG payloads (e.g. the text stand-ins from
    * [[binaryized]]) fall back to deterministic synthetic dims derived
    * from the payload hash, since this container has no image/audio
    * codecs — that branch is the clearly-marked stand-in; the schema,
    * batching and partition layout around it are real either way.
    * Still one codegen'd projection per row, no UDF, no shuffle. */
  val decodedSchema = "struct<width:int,height:int,n_frames:int>"
  def decode(df: DataFrame): DataFrame = {
    import graft.functions.JpegDims.jpegDims
    df.withColumn("jpeg_packed", jpegDims(col("payload")))
      .withColumn("decoded", expr(
        """CASE WHEN jpeg_packed >= 0 THEN named_struct(
             'width',    cast(shiftright(jpeg_packed, 32) as int),
             'height',   cast(jpeg_packed & 4294967295 as int),
             'n_frames', 1)
           ELSE named_struct(
             'width',    16 + pmod(cast(conv(substring(md5(payload), 1, 4), 16, 10) as int), 1024),
             'height',   16 + pmod(cast(conv(substring(md5(payload), 5, 4), 16, 10) as int), 1024),
             'n_frames', 1 + pmod(cast(conv(substring(md5(payload), 9, 2), 16, 10) as int), 32))
           END"""))
      .drop("jpeg_packed")
  }

  /** Frame-sampling over the stubbed decode: one row per sampled frame —
    * the explode pattern a video pipeline uses (sample every k-th frame). */
  def frameSample(df: DataFrame, everyK: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("decoded.n_frames") - 1, lit(everyK))))

  /** Resize stub: clamps the stubbed dimensions to a bounding box
    * preserving aspect ratio (integer arithmetic; the real pixel work
    * would live in the decode library). */
  def resizeStub(df: DataFrame, maxSide: Int = 256): DataFrame =
    df.withColumn("resized", expr(
      s"""CASE WHEN greatest(decoded.width, decoded.height) <= $maxSide THEN
            named_struct('width', decoded.width, 'height', decoded.height)
          ELSE named_struct(
            'width',  greatest(1, cast(decoded.width  * $maxSide / greatest(decoded.width, decoded.height) as int)),
            'height', greatest(1, cast(decoded.height * $maxSide / greatest(decoded.width, decoded.height) as int)))
          END"""))

  /** Feature-extraction stub: fixed-width feature vector per payload,
    * derived from content hash — stands in for an image embedding. */
  def featureStub(df: DataFrame, dims: Int = 8): DataFrame =
    df.withColumn("features", expr(
      s"""transform(sequence(1, $dims), i ->
            cast(cast(conv(substring(md5(payload), i * 2, 4), 16, 10) as int) / 65535.0 as float))"""))

  /** Byte-level SimHash signature per payload: distinct byte 4-grams
    * (as hex strings, so both engines hash the identical token text) →
    * `bits`-wide SimHash. No codec needed — the signature reads the raw
    * bytes, so it works on ANY binary payload (JPEG, audio, the text
    * stand-ins) and a few flipped bytes only flip a few signature bits. */
  def byteSimhash(bin: DataFrame, bits: Int = 60): DataFrame =
    bin
      .filter(length(col("payload")) >= 4)
      .withColumn("hx", lower(hex(col("payload"))))
      .withColumn("grams", array_distinct(expr(
        "transform(sequence(0, cast(length(payload) as int) - 4), i -> substring(hx, i*2+1, 8))")))
      .withColumn("simhash", graft.functions.MinHash.simhashSig(col("grams"), bits))
      .select("doc_id", "simhash")

  /** Image/binary NEAR-DUP pairs: [[byteSimhash]] feeding the same
    * k+1-band hamming pigeonhole join as the text dedup family
    * ([[Dedup.hammingPairsOfSigs]]) — candidates only from band-bucket
    * collisions, shuffle-bounded, never all-pairs. The multimodal column
    * gets the same near-dup query as every other modality: a JPEG and a
    * few-bytes-perturbed copy of itself land within hamming ≤ k. */
  def byteNearDupPairsOf(bin: DataFrame, k: Int = 3, bits: Int = 60): DataFrame =
    Dedup.hammingPairsOfSigs(byteSimhash(bin, bits), k, bits)

  /** [[byteNearDupPairsOf]] over the binaryized documents payloads. */
  def byteNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    byteNearDupPairsOf(binaryized(spark, dir).select("doc_id", "payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"   -> binaryMeta _,
    "mm_neardup_pairs" -> byteNearDupPairs _,
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           lower(substr(hex(encode(text)), 1, 8)) AS magic_hex
         FROM documents ORDER BY doc_id""",
    // byte 4-grams as lowercase hex strings over the UTF-8 payload —
    // token text identical to the Spark side, then the shared hamming
    // oracle machinery
    "mm_neardup_pairs" -> Dedup.hammingKOracleFrom(
      """p AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
                octet_length(encode(text)) AS n
              FROM documents),
         toks AS (
           SELECT doc_id,
             unnest(list_distinct(list_transform(range(0, n - 3),
               i -> substr(hx, CAST(i*2 + 1 AS BIGINT), 8)))) AS tok
           FROM p WHERE n >= 4)""", k = 3, bits = 60),
  )
}
