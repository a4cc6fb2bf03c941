package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{IndexStore, Tables}

/** Deduplication operators for a large-scale training-data pipeline
  * (builder brief): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - exact dedup is one hash-groupBy — a single shuffle on the content
  *    hash, partial counts map-side;
  *  - MinHash signatures are a per-row projection + one (doc, band)
  *    aggregation; candidate generation joins on (band, bucket) so only
  *    docs sharing a bucket are ever paired — never the O(n²) cross
  *    product. At 100 TB the band-bucket join is the standard LSH
  *    shuffle-bounded plan;
  *  - SimHash is a per-row signature (bucket-join or bit-sampling pairs
  *    it downstream);
  *  - the only intentionally quadratic oracle query pairs *adjacent*
  *    doc_ids (a bounded self-join) to hash-check the Jaccard math
  *    itself.
  *
  * MinHash here uses md5-based hash families (min over lexicographic md5
  * of seed|shingle) — engine-portable, so the whole pipeline is
  * hash-checked against DuckDB rather than rows-only.
  */
object Dedup {

  /** Distinct 3-gram (token shingle) array per document. */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")))

  /** (band, bucket) rows for any (doc_id, text) frame — the map-side
    * MinHash signature + 4×2 banding shared by the LSH queries. */
  private[graft] def minhashBandsOf(docs: DataFrame): DataFrame = {
    val sig = withShingles(docs)
      .withColumn("mh", graft.functions.MinHash.minhashSig(col("shingles")))
    sig.select(col("doc_id"), expr(
      """stack(4,
           0, concat(cast(mh[0] as string), '_', cast(mh[1] as string)),
           1, concat(cast(mh[2] as string), '_', cast(mh[3] as string)),
           2, concat(cast(mh[4] as string), '_', cast(mh[5] as string)),
           3, concat(cast(mh[6] as string), '_', cast(mh[7] as string))) AS (band, bucket)"""))
  }

  /** Exact dedup summary: hash-groupBy on content hash. */
  def exactSummary(spark: SparkSession, dir: String): DataFrame = {
    val groups = Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
    groups.agg(
      sum(col("c")).as("n_docs"),
      count(lit(1)).as("n_distinct"),
      count(when(col("c") > 1, 1)).as("dup_groups"),
      coalesce(sum(when(col("c") > 1, col("c"))), lit(0)).as("dup_rows"))
  }

  /** n-gram Jaccard similarity on adjacent doc pairs — bounded pairing
    * exercising the shingle/Jaccard math end-to-end.
    *
    * Pairing is explode-to-(pair, side) + one aggregation instead of a
    * self-join: the join formulation computes the shingle projection
    * TWICE (the two sides shuffle on different keys, so the exchanges
    * cannot be reused) and runs two exchanges + a join; this shape
    * shingles once and runs a single shuffle. */
  def jaccardAdjacent(spark: SparkSession, dir: String): DataFrame = {
    val d = withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), col("shingles"))
    d.select(explode(expr(
      """array(struct(doc_id as pair, 0 as side, shingles),
               struct(doc_id - 1 as pair, 1 as side, shingles))""")).as("e"))
      .select("e.*")
      .groupBy("pair").agg(
        first(when(col("side") === 0, col("shingles")), ignoreNulls = true).as("sh_a"),
        first(when(col("side") === 1, col("shingles")), ignoreNulls = true).as("sh_b"))
      .filter(col("sh_a").isNotNull && col("sh_b").isNotNull)
      .withColumn("doc_a", col("pair"))
      .withColumn("doc_b", col("pair") + 1)
      .withColumn("n_a", size(col("sh_a")))
      .withColumn("n_b", size(col("sh_b")))
      // codegen'd count-only intersection (graft.functions.IntersectCount):
      // size(array_intersect(...)) builds and copies the intersection
      // array just to take its length
      .withColumn("n_common",
        graft.functions.ArrayOps.intersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .select("doc_a", "doc_b", "n_a", "n_b", "n_common", "jaccard")
      .orderBy("doc_a")
  }

  /** MinHash signatures: 8 md5-family min-hashes per doc, folded into 4
    * LSH bands of 2 rows each. Returns (doc_id, band, bucket).
    *
    * The signature is ONE codegen'd pass over the shingle array
    * ([[graft.functions.MinHashSignature]]: md5 → first-4-bytes base
    * hash → 8 affine minima, mh_i = min((a_i·h + b_i) mod p)) — a pure
    * per-row projection, so signature computation is entirely map-side
    * (no explode, no shuffle); the only shuffle in the whole pipeline is
    * the downstream (band, bucket) join. The SQL-function formulation
    * walked the array through interpreted md5/conv lambdas plus a fold
    * allocating an 8-element array per shingle. */
  private def minhashBands(spark: SparkSession, dir: String): DataFrame =
    minhashBandsOf(Tables.documents(spark, dir))

  // ------------------------------------- persisted dedup index tables
  // The signature derivation (md5 → shingles → 8 affine minima) is the
  // expensive map-side pass every LSH query pays; at 100 TB it is
  // derived ONCE at ingest and maintained as bucketed tables. These
  // orBuild wrappers give the dir-based queries that lifecycle: the
  // first query against a corpus builds, every later query — and every
  // later SESSION ([[graft.sources.IndexStore]]) — reads the stored
  // bucketed table with zero derivation work.

  /** Exact-group representatives of the documents table, persisted:
    * (h, doc_id, n_dups, text) bucketed by doc_id. */
  private def repsTable(spark: SparkSession, dir: String): DataFrame =
    IndexStore.orBuild(spark, s"dd_reps_${IndexStore.keyOf(dir)}", 32, Seq("doc_id"))(
      repsOf(Tables.documents(spark, dir)))

  /** MinHash band table of the exact-group REPRESENTATIVES, persisted
    * bucketed by (band, bucket) — the join key of every pair query, so
    * the candidate self-join below runs exchange-free. */
  private def repBandsTable(spark: SparkSession, dir: String): DataFrame =
    IndexStore.orBuild(spark, s"dd_repbands_${IndexStore.keyOf(dir)}", 32, Seq("band", "bucket"))(
      minhashBandsOf(repsTable(spark, dir).select("doc_id", "text")))

  /** MinHash band table of ALL documents (dup rows included — the
    * contract of `dd_minhash_lsh_pairs`), persisted like
    * [[repBandsTable]]. */
  private def docBandsTable(spark: SparkSession, dir: String): DataFrame =
    IndexStore.orBuild(spark, s"dd_docbands_${IndexStore.keyOf(dir)}", 32, Seq("band", "bucket"))(
      minhashBandsOf(Tables.documents(spark, dir)))

  /** Distinct LSH candidate pairs from a (doc_id, band, bucket) band
    * table: docs sharing any band bucket. Join is on (band, bucket) —
    * shuffle-bounded, no cross product (and exchange-free when the
    * bands come from a persisted bucketed table). */
  private[operators] def lshPairsFromBands(bands: DataFrame): DataFrame = {
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Distinct LSH candidate pairs of any (doc_id, text) frame —
    * derive-inline variant for generic frames (specs, paragraph spans);
    * the dir-based queries read the persisted band tables instead. */
  private def lshPairsOf(docs: DataFrame): DataFrame =
    lshPairsFromBands(minhashBandsOf(docs))

  /** CONNECTIVITY pairs from a band table: per (band, bucket) STAR —
    * every member links to the bucket's minimum doc_id instead of to
    * every other member. A bucket is one connected blob under either
    * encoding, so the transitive closure (and therefore every
    * connected-components group downstream) is IDENTICAL to the
    * all-pairs clique — at (n−1) edges per bucket instead of C(n,2).
    * That linearizes the one genuinely quadratic term left in the
    * suite: a near-dup family of k variants (the 100× stress corpus
    * plants ~replicas variants of every document's final paragraph —
    * r7 verdict #5, dd_paragraph_dedup 111× at 100× data) lands in one
    * bucket and cost k²/2 pair rows per band. GROUP pipelines use this;
    * pair-LISTING queries keep [[lshPairsFromBands]] — emitting the
    * full candidate set IS their contract. The window shuffles on
    * (band, bucket), the persisted band tables' bucketing key, so off a
    * stored index it is exchange-free. */
  private[operators] def lshStarPairsFromBands(bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bands
      .withColumn("hub",
        min(col("doc_id")).over(Window.partitionBy("band", "bucket")))
      .filter(col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** [[lshStarPairsFromBands]] of any (doc_id, text) frame. */
  private def lshStarPairsOf(docs: DataFrame): DataFrame =
    lshStarPairsFromBands(minhashBandsOf(docs))

  /** MinHash+LSH near-dup candidate pairs over the documents table,
    * served from the persisted doc-level band index. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame =
    lshPairsFromBands(docBandsTable(spark, dir)).orderBy("doc_a", "doc_b")

  /** TRAIN/TEST LEAKAGE AUDIT — the composition every split pipeline
    * must run before shipping an eval set: near-duplicate pairs (the
    * MinHash band candidates, same recall set as [[minhashLshPairs]])
    * that STRADDLE split boundaries under the deterministic md5-bucket
    * assignment of `ta_split_assign` (train <90, val <95, test
    * otherwise). A pair here means an eval document has a near-copy in
    * training — the contamination the split hashing alone cannot
    * prevent, because hashing is content-blind while duplication is
    * content-driven.
    *
    * Scale: band-bucket candidate join (never all-pairs) + two
    * dictionary joins of the doc→split projection. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val pairs = lshPairsFromBands(docBandsTable(spark, dir))
    val split = Tables.documents(spark, dir)
      .select(col("doc_id"), when(
        expr("pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 100)") < 90,
        lit("train"))
        .when(expr("pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 100)") < 95,
          lit("val"))
        .otherwise(lit("test")).as("split"))
    pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b", "split_a", "split_b")
      .orderBy("doc_a", "doc_b")
  }

  /** Asymmetric CONTAINMENT scoring over the LSH candidates — catches
    * doc-in-doc duplication (quotes, excerpts, wrapper pages) that
    * symmetric Jaccard under-scores: a 50-shingle doc fully embedded in
    * a 500-shingle doc has Jaccard 0.1 but containment_a = 1.0. Both
    * directions are emitted (n_common/n_a and n_common/n_b) so the
    * consumer picks which side is "the excerpt". Candidates come from
    * the persisted MinHash band index (same recall set as
    * [[minhashLshPairs]] — no all-pairs); the shingle re-join touches
    * only candidate docs. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val cand = lshPairsFromBands(docBandsTable(spark, dir))
    val sh = withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), col("shingles"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .withColumn("n_a", size(col("sh_a")).cast("long"))
      .withColumn("n_b", size(col("sh_b")).cast("long"))
      .withColumn("n_common",
        graft.functions.ArrayOps.intersectCount(col("sh_a"), col("sh_b")).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") / col("n_a").cast("double")).as("containment_a"),
        (col("n_common").cast("double") / col("n_b").cast("double")).as("containment_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL ingest dedup — the daily-batch shape: a new batch is
    * admitted against an EXISTING corpus without re-pairing the corpus
    * with itself. Two stages, mirroring [[dedupPipelinePairs]]:
    *
    *  1. exact: anti-join the batch's content hashes against the
    *     corpus's (one shuffle on the md5 — at scale the corpus side is
    *     a bucketed hash index, so this is a co-located join);
    *  2. near: band the exact survivors and equi-join their (band,
    *     bucket) keys against the CORPUS bands only — batch×corpus
    *     candidates, never corpus×corpus (the corpus bands are computed
    *     once per ingest and at scale live as a materialized band table,
    *     appended per batch).
    *
    * Every new doc gets a verdict: 'dup_exact' (verbatim copy of a
    * corpus doc), 'dup_near' (shares an LSH bucket with one), or
    * 'accept'. Output is per-verdict accounting plus min/max doc_id so
    * the gate pins membership, not just counts. The batch here is the
    * deterministic doc_id % 10 = 0 slice standing in for today's crawl. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexStore
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    // the corpus hash set and band table are the INDEX side of every
    // future batch admission — materialize them once per (session,
    // corpus) as bucketed tables instead of re-deriving the corpus
    // MinHash signatures on every run (at 100 TB these are the
    // ingest-maintained tables the operator's doc promises; appends per
    // admitted batch keep them current)
    val key = IndexStore.keyOf(dir)
    val corpusHashes = IndexStore.orBuild(spark, s"dd_chash_$key", 32, Seq("h"))(
      corpus.select(md5(col("text")).as("h")).distinct())
    val corpusBands = IndexStore.orBuild(spark, s"dd_cbands_$key", 32, Seq("band", "bucket"))(
      minhashBandsOf(corpus.select("doc_id", "text"))
        .select(col("band"), col("bucket")).distinct())
    incrementalDedupWith(docs.filter(col("doc_id") % 10 === 0),
      corpusHashes, corpusBands)
  }

  /** [[incrementalDedup]] over explicit batch/corpus frames (spec entry
    * point — derives the corpus hash/band tables inline). */
  def incrementalDedupOf(batch: DataFrame, corpus: DataFrame): DataFrame =
    incrementalDedupWith(batch,
      corpus.select(md5(col("text")).as("h")).distinct(),
      minhashBandsOf(corpus.select("doc_id", "text"))
        .select(col("band"), col("bucket")).distinct())

  /** The admission core over a prebuilt corpus index: `corpusHashes` is
    * the distinct md5 set, `corpusBands` the distinct (band, bucket)
    * table — stored ([[incrementalDedup]]) or derived
    * ([[incrementalDedupOf]]). */
  private def incrementalDedupWith(batch: DataFrame, corpusHashes: DataFrame,
                                   corpusBands: DataFrame): DataFrame = {
    val exactSurvivors = batch.withColumn("h", md5(col("text")))
      .join(corpusHashes, Seq("h"), "left_anti")
    val batchBands = minhashBandsOf(exactSurvivors.select("doc_id", "text"))
    val nearDups = batchBands.join(corpusBands, Seq("band", "bucket"))
      .select("doc_id").distinct()
    val verdicts = batch.select("doc_id")
      .join(exactSurvivors.select(col("doc_id"), lit(true).as("survived")), Seq("doc_id"), "left")
      .join(nearDups.select(col("doc_id"), lit(true).as("near")), Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("survived").isNull, lit("dup_exact"))
          .when(col("near").isNotNull, lit("dup_near"))
          .otherwise(lit("accept")))
    verdicts.groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("verdict")
  }

  /** 16-bit SimHash per document from distinct tokens: token hash = first
    * 4 hex digits of md5; bit b of the signature is the sign of the
    * ±1 vote sum across tokens.
    *
    * Entirely per-row and codegen'd ([[graft.functions.SimHashSignature]]
    * folds all 16 vote counters in one primitive pass) — no explode, no
    * groupBy, zero shuffles (the round-1 explode×16 + two groupBys
    * shuffled a 16×-expanded token table; the round-1.5 SQL fold was
    * per-row but interpreted, allocating a 16-element array per token).
    * Docs with no qualifying tokens are dropped, matching the explode
    * formulation and the oracle's unnest. */
  def simhash16(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("toks",
        expr("filter(array_distinct(split(lower(text), ' ')), t -> length(t) > 0)"))
      .filter(size(col("toks")) > 0)
      .withColumn("simhash", graft.functions.MinHash.simhashSig(col("toks")))
      .select("doc_id", "simhash")
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs at hamming distance ≤ 1, via the multi-index
    * pigeonhole: split the 16-bit signature into two 8-bit bands — any
    * pair within distance 1 agrees on at least one full band, so
    * candidates come from two band equi-joins (shuffle-bounded, never
    * all-pairs) and the exact hamming filter runs only on collisions.
    * The same construction scales to distance ≤ k with k+1 bands; at
    * 100 TB the production shape is a 64-bit signature with 16-bit
    * bands (65 k buckets per band) — the 16-bit/8-bit split here keeps
    * the math oracle-checkable. */
  def simhashHammingPairs(spark: SparkSession, dir: String): DataFrame = {
    // explode each signature to its two (band, key) rows and self-join
    // ONCE on (band, key) — the same shape as the MinHash band join
    // (two per-band joins would evaluate the signature subplan 4×, the
    // banded union only 2×, and one shuffle replaces two)
    val banded = simhash16(spark, dir)
      .select(col("doc_id"), col("simhash"), explode(expr(
        """array(struct(0 as band, simhash div 256 as bkey),
                 struct(1 as band, simhash % 256 as bkey))""")).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bkey"))
    val a = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
      col("band"), col("bkey"))
    val b = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
      col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .filter(col("hamming") <= 1)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Wide SimHash signatures (60-bit by default — the cross-engine
    * positive-BIGINT bound, see [[graft.functions.MinHashUtil.simhashW]]). */
  def simhashWide(spark: SparkSession, dir: String, bits: Int = 60): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks",
        expr("filter(array_distinct(split(lower(text), ' ')), t -> length(t) > 0)"))
      .filter(size(col("toks")) > 0)
      .withColumn("simhash", graft.functions.MinHash.simhashSig(col("toks"), bits))
      .select("doc_id", "simhash")

  /** Band boundaries for hamming ≤ k over a `bits`-wide signature:
    * k+1 bands as equal as possible (width difference ≤ 1). Returns
    * (lo, width) per band, low bits first. */
  private[operators] def hammingBands(bits: Int, k: Int): Seq[(Int, Int)] = {
    // k+1 > bits would produce zero-width bands whose mask is 0 — every
    // doc collides in those bands and the shuffle-bounded candidate join
    // degrades to the all-pairs product this operator exists to prevent
    require(k >= 0 && k + 1 <= bits,
      s"hamming bands need k + 1 <= bits, got k=$k bits=$bits")
    val nBands = k + 1
    val base = bits / nBands
    val extra = bits % nBands
    val widths = Seq.tabulate(nBands)(b => base + (if (b < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** SimHash near-dup pairs at hamming distance ≤ k via the k+1-band
    * pigeonhole: any pair within distance k agrees on at least one full
    * band (k flipped bits cannot touch all k+1 bands), so candidates
    * come from ONE equi-join on the exploded (band, key) rows and the
    * exact hamming filter runs only on collisions. Shuffle-bounded,
    * never all-pairs — the generalization of [[simhashHammingPairs]]'
    * fixed k=1/16-bit shape; at 100 TB: 60-bit signature, k=3, 15-bit
    * bands (32 k buckets per band). */
  def simhashHammingKPairs(spark: SparkSession, dir: String,
                           k: Int = 2, bits: Int = 60): DataFrame =
    hammingPairsOfSigs(simhashWide(spark, dir, bits), k, bits)

  /** Banded hamming-≤k candidate generation over ANY (doc_id, simhash)
    * frame — the k+1-band pigeonhole machinery shared by the token-level
    * queries and the multimodal byte-signature near-dup
    * ([[Multimodal.byteNearDupPairs]]).
    *
    * Two pair-generation shapes, chosen by how expensive the signature
    * subplan is (both emit the identical candidate set, so the oracle is
    * shared):
    *
    *  - `bucketLocal = false` (default): band self-JOIN. Two exchanges
    *    plus a distinct shuffle, and the signature subplan evaluates
    *    once per side — the right trade when signatures are cheap
    *    (token-level SimHash: ~50 tokens/doc), because the join
    *    parallelizes candidate scoring across tasks and AQE handles
    *    bucket skew. Measured at sf1 the k=2 token query runs ~8 s this
    *    way vs ~12 s bucket-locally (the interpreted combination lambda
    *    is the overhead).
    *  - `bucketLocal = true`: groupBy (band, bkey) → sort_array →
    *    in-array i<j combinations. Signatures compute ONCE and shuffle
    *    once — the right trade when the signature dominates (byte-gram
    *    SimHash over payload prefixes: the self-join's per-side
    *    re-evaluation alone doubled the query; measured 33 s → 2.4 s at
    *    sf0.1). Per-bucket work is quadratic in occupancy, which is what
    *    banding bounds; a mega-bucket means the band geometry is
    *    undersized — fix k/bits, not the shape. */
  private[operators] def hammingPairsOfSigs(sigs: DataFrame, k: Int, bits: Int,
                                            bucketLocal: Boolean = false): DataFrame = {
    val bandStructs = hammingBands(bits, k).zipWithIndex.map {
      case ((lo, w), b) =>
        val mask = (1L << w) - 1
        s"struct($b as band, shiftright(simhash, $lo) & ${mask}L as bkey)"
    }.mkString("array(", ", ", ")")
    val banded = sigs
      .select(col("doc_id"), col("simhash"), explode(expr(bandStructs)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bkey"))
    val cand =
      if (bucketLocal)
        banded
          .groupBy("band", "bkey")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
          .filter(size(col("ds")) > 1)
          .select(explode(expr(
            """flatten(transform(ds, (x, i) ->
                 transform(slice(ds, i + 2, size(ds) - i - 1),
                   y -> struct(x.doc_id as doc_a, y.doc_id as doc_b,
                               x.simhash as sig_a, y.simhash as sig_b))))""")).as("p"))
          .select("p.*")
      else {
        val a = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
          col("band"), col("bkey"))
        val b = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
          col("band"), col("bkey"))
        a.join(b, Seq("band", "bkey"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sig_a", "sig_b")
      }
    cand
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .filter(col("hamming") <= k)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Production dedup PIPELINE: exact-first, then MinHash+LSH over the
    * exact-group representatives only.
    *
    * Why this is the 100 TB shape: web-scale corpora carry ~30%
    * verbatim duplicates, and running LSH on the raw corpus turns every
    * verbatim group into an LSH clique — candidate pairs grow
    * QUADRATICALLY in group size (a 1 k-copy boilerplate page alone is
    * ~500 k pairs, in every band). Collapsing exact groups first costs
    * one hash-groupBy (the cheapest shuffle in the suite) and caps the
    * clique blowup at zero; the group sizes ride along so downstream
    * dedup decisions still weight by how many copies a representative
    * stands for. Output: near-dup representative pairs with both
    * verbatim-copy counts. */
  def dedupPipelinePairs(spark: SparkSession, dir: String): DataFrame = {
    val counts = repsTable(spark, dir).select(col("doc_id"), col("n_dups"))
    lshPairsFromBands(repBandsTable(spark, dir))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_dups").as("dups_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_dups").as("dups_b")), "doc_b")
      .select("doc_a", "doc_b", "dups_a", "dups_b")
      .orderBy("doc_a", "doc_b")
  }

  /** md5 exact-group representatives of a (doc_id, text) frame:
    * (h, doc_id = min id of the group, n_dups, text). */
  private def repsOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_dups"),
        // texts in a group are identical; min() just keeps it deterministic
        min(col("text")).as("text"))

  /** [[dedupPipelinePairs]] over any (doc_id, text) frame (spec entry
    * point for corpora with actual verbatim duplicates). */
  def dedupPipelinePairsOf(docs: DataFrame): DataFrame = {
    val reps = repsOf(docs)
    val pairs = lshPairsOf(reps.select("doc_id", "text"))
    val counts = reps.select(col("doc_id"), col("n_dups"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n_dups").as("dups_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_dups").as("dups_b")), "doc_b")
      .select("doc_a", "doc_b", "dups_a", "dups_b")
      .orderBy("doc_a", "doc_b")
  }

  /** Connected components over an undirected candidate-pair graph via
    * smallest-id label propagation with pointer jumping. `nodes` is one
    * `node` column; `pairs` is (doc_a, doc_b). Returns (node, group_id)
    * where group_id = smallest node id in the component.
    *
    * Each round does (1) a propagate join — every node takes the min of
    * its own label and its neighbors' — and (2) a pointer-jump join —
    * label := label(label) — so labels race down chains exponentially
    * and the loop converges in O(log n) rounds instead of O(diameter).
    * Per-round lineage is truncated with localCheckpoint (an iterative
    * self-join otherwise compounds the plan), and the fixpoint test is a
    * changed-row count — a control-flow scalar, not a data collect. At
    * 100 TB this is the standard iterative-CC shape: edges are persisted
    * once and every round is two shuffles on the node key.
    *
    * `checkpointDir`: when set, per-round lineage truncation uses
    * RELIABLE `checkpoint()` into that directory instead of
    * executor-local blocks — the cluster-grade variant: localCheckpoint
    * blocks die with their executor, so on a real cluster an executor
    * loss mid-loop kills the job; reliable checkpoints survive it at the
    * cost of a distributed-FS write per round. Default (None) keeps the
    * single-box behavior. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIters: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    // same runtime shaping as Graph.pageRankConvergedOf (r10): the loop
    // runs a handful of small two-shuffle rounds whose inputs are all
    // checkpointed tables with exact stats — AQE's stage-wise execution
    // only adds driver round-trips per round, and node-sized exchanges
    // drown in full-width task scheduling. The overrides live in the
    // caller session's cached companion loop session
    // ([[graft.LoopSessions]] — shared SparkContext + shared external
    // catalog, isolated SQLConf; ADVICE r10) instead of
    // mutate-and-restore on the caller's session, which was neither
    // reentrant nor thread-safe (and a fresh newSession per call
    // measured ~0.5 s of SessionState setup per run). Input/output
    // plans are re-rooted across sessions (already-analyzed plans;
    // catalog tables resolve identically through the shared external
    // catalog), so the caller's downstream frame executes under its
    // own conf.
    import org.apache.spark.sql.GraftColumnBridge.{logicalPlan, ofRows}
    val spark = pairs.sparkSession
    val loopSession = graft.LoopSessions.of(spark)
    graft.LoopSessions.locked {
      val out = connectedComponentsLoop(
        ofRows(loopSession, logicalPlan(nodes)),
        ofRows(loopSession, logicalPlan(pairs)),
        maxIters, checkpointDir,
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      ofRows(spark, logicalPlan(out))
    }
  }

  private def connectedComponentsLoop(nodes: DataFrame, pairs: DataFrame,
                                      maxIters: Int,
                                      checkpointDir: Option[String],
                                      sessionShuffle: Int): DataFrame = {
    checkpointDir.foreach(d => pairs.sparkSession.sparkContext.setCheckpointDir(d))
    // eager=false in both modes: the changed-count job each round is what
    // materializes the checkpoint, so every round stays ONE compute.
    // Reliable mode additionally persists the frame BEFORE checkpointing:
    // Spark writes reliable checkpoint files in a follow-up job that
    // otherwise RECOMPUTES the full lineage (the documented
    // persist-before-checkpoint rule) — cached, that job is a cache scan.
    // The cache is dropped right after the round's action materializes
    // the checkpoint files.
    var roundCache: Option[DataFrame] = None
    def truncate(df: DataFrame, eager: Boolean): DataFrame =
      if (checkpointDir.isDefined) {
        val cached = df.persist()
        roundCache.foreach(_.unpersist())
        roundCache = Some(cached)
        cached.checkpoint(eager)
      } else df.localCheckpoint(eager)
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val nPart = math.min(sessionShuffle,
      math.max(4L, edges.count() / 100000L)).toInt
    pairs.sparkSession.conf.set("spark.sql.shuffle.partitions", nPart.toString)
    // Iterate ONLY over nodes that appear in a pair: every other node is
    // a singleton by construction (its label can never change), so it
    // joins back at the end. At corpus scale this is the difference
    // between iterating over every representative and iterating over the
    // (tiny) near-dup graph — the loop's joins shrink from O(corpus) to
    // O(pairs) rows per round.
    val pairNodes = edges.select(col("src").as("node")).distinct()
    var labels = truncate(pairNodes.select(col("node"), col("node").as("label")), eager = true)
    var converged = false
    var iter = 0
    // Convergence is probed every 2 rounds (same job-count lever as
    // Graph.pageRankConvergedOf's fused probes): labels are min-MONOTONE
    // — they only ever decrease — so zero diff across two rounds proves
    // both rounds were fixpoints. The skipped round's lazy checkpoint is
    // materialized by the NEXT round's probe job (its lineage is cut
    // either way), so each probe stays one compute; at fixed data the
    // loop's wall time is jobs × scheduling overhead, and this halves
    // the jobs for at most one extra (no-change) round of work. In
    // reliable-checkpoint mode every round keeps its own probe: the
    // round cache that protects the checkpoint writer from lineage
    // recomputation is dropped per round, so rounds must materialize
    // as they are created.
    val probeEvery = if (checkpointDir.isDefined) 1 else 2
    var checkBase = labels
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val propagated = labels.select("node", "label").union(neighborMin)
        .groupBy("node").agg(min(col("label")).as("label"))
      val jump = propagated.select(col("node").as("jn"), col("label").as("jl"))
      // lazy checkpoint: the probe job below (or the next round feeding
      // the following probe) materializes it, so each round runs at most
      // ONE job (lineage is still truncated for the next round)
      val next = truncate(
        propagated.join(jump, propagated("label") === jump("jn"), "left")
          .select(propagated("node"),
            coalesce(col("jl"), propagated("label")).as("label")),
        eager = false)
      labels = next
      iter += 1
      if (iter % probeEvery == 0 || iter >= maxIters) {
        val changed = labels
          .join(checkBase.select(col("node"), col("label").as("prev")), "node")
          .filter(col("label") =!= col("prev")).limit(1).count()
        converged = changed == 0
        checkBase = labels
      }
    }
    edges.unpersist()
    roundCache.foreach(_.unpersist())
    require(converged, s"label propagation did not converge in $maxIters rounds")
    // singletons (nodes with no pair) keep their own id as the group id
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("group_id"))
  }

  /** Corpus dedup GROUPS: the full pairs → components → keep-set
    * pipeline. Exact groups collapse to representatives, the LSH
    * candidate-pair graph over representatives is closed transitively
    * (so (a,b),(b,c) collapse to ONE group — candidate pairs alone
    * over-keep b or c), and every original document gets its group:
    * (doc_id, group_id = min doc_id of the group, group_size counting
    * every verbatim copy, is_canonical = the one row per group to keep).
    * The pipeline analog of the reference's keep-first `seen_collabs`
    * dedup (analyze_insta_enhanced.py:1283,1316-1376) at corpus scale. */
  def dedupGroupsOf(docs: DataFrame, checkpointDir: Option[String] = None): DataFrame = {
    // reps feeds the LSH pair graph twice (the band self-join evaluates
    // its subplan once per side) — persist so the exact-group aggregation
    // runs once. The component loop inside dedupGroupsWithPairs runs its
    // jobs eagerly, so by the time it returns NOTHING lazy references
    // reps and it can be unpersisted here rather than leaking cached
    // blocks for the session lifetime.
    val reps = repsOf(docs).persist()
    // star pairs: identical components, linear (not quadratic) in LSH
    // bucket width — see lshStarPairsFromBands
    val out = dedupGroupsWithPairs(docs, lshStarPairsOf(reps.select("doc_id", "text")),
      checkpointDir)
    reps.unpersist()
    out
  }

  /** [[dedupGroupsOf]] with the candidate-pair graph supplied by the
    * caller — the entry point when pairs come from a PERSISTED band
    * index instead of an inline derivation. The per-doc rep comes from
    * a window-min over the md5 group, not a join back to reps. */
  def dedupGroupsWithPairs(docs: DataFrame, pairs: DataFrame,
                           checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docRep = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("rep", min(col("doc_id")).over(Window.partitionBy("h")))
    val comp = connectedComponents(
      docRep.select(col("rep").as("node")).distinct(), pairs,
      checkpointDir = checkpointDir)
    docRep
      .join(comp.select(col("node").as("rep"), col("group_id")), "rep")
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy("group_id")))
      .withColumn("is_canonical", col("doc_id") === col("group_id"))
      .select("doc_id", "group_id", "group_size", "is_canonical")
      .orderBy("doc_id")
  }

  /** Persisted GROUP LABELS for the documents table — the third (and
    * final) artifact of the dedup index lifecycle. Reps and band tables
    * were already build-once; the connected-components fixpoint output
    * (doc_id → group_id) is just as deterministic per corpus, and it is
    * the artifact every downstream consumer (keep-set summary, corpus
    * pipeline, retention audit) actually joins against. Re-running an
    * O(log n)-round iterative fixpoint per query is exactly the
    * "re-pay the derivation" anti-pattern `IndexStore` exists to end:
    * at 100 TB the label table is written once at ingest and every
    * consumer bucket-joins it on doc_id. */
  private[graft] def groupsTable(spark: SparkSession, dir: String): DataFrame =
    IndexStore.orBuild(spark, s"dd_groups_${IndexStore.keyOf(dir)}", 32, Seq("doc_id"))(
      dedupGroupsWithPairs(Tables.documents(spark, dir),
        lshStarPairsFromBands(repBandsTable(spark, dir))))

  /** [[dedupGroupsOf]] over the documents table, served from the
    * persisted group-label index ([[groupsTable]]). */
  def dedupGroups(spark: SparkSession, dir: String): DataFrame =
    groupsTable(spark, dir)
      .select("doc_id", "group_id", "group_size", "is_canonical")
      .orderBy("doc_id")

  /** [[dedupGroupsOf]] over an arbitrary DETERMINISTIC corpus slice
    * (quality-gate survivors, paragraph spans, …) with its reps, band,
    * AND group-label tables persisted under `prefix` — the generic
    * entry point other pipelines use to give their dedup stage the
    * build-once index lifecycle. The group labels are the top-level
    * artifact: on an index hit neither the signature pass nor the
    * components fixpoint runs at all. The caller owns prefix uniqueness
    * per (slice, corpus); [[graft.sources.IndexStore.keyOf]] supplies
    * the corpus part. */
  def dedupGroupsPersisted(spark: SparkSession, prefix: String, docs: DataFrame,
                           checkpointDir: Option[String] = None): DataFrame =
    IndexStore.orBuild(spark, s"${prefix}_groups", 32, Seq("doc_id"))({
      val reps = IndexStore.orBuild(spark, s"${prefix}_reps", 32, Seq("doc_id"))(
        repsOf(docs))
      val bands = IndexStore.orBuild(spark, s"${prefix}_bands", 32, Seq("band", "bucket"))(
        minhashBandsOf(reps.select("doc_id", "text")))
      dedupGroupsWithPairs(docs, lshStarPairsFromBands(bands), checkpointDir)
    }).select("doc_id", "group_id", "group_size", "is_canonical")

  // ---------------------------------------------- paragraph-level dedup

  /** Fixed-span "paragraphs": consecutive `tokensPerPara`-token windows
    * of each document, ordinal-keyed — the span granularity for corpora
    * WITHOUT structural markers (the synthetic documents table is one
    * line of tokens). A single posexplode'd projection per doc; the
    * final span keeps whatever tokens remain. */
  private[graft] def paragraphs(docs: DataFrame, tokensPerPara: Int = 25): DataFrame =
    docs.filter(length(col("text")) > 0)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(toks) / ${tokensPerPara}.0) as int) - 1),
              i -> concat_ws(' ', slice(toks, i * $tokensPerPara + 1, $tokensPerPara)))""")))
      .toDF("doc_id", "para_idx", "para")

  /** Delimiter paragraphs for documents that DO carry structure
    * (newline-separated paragraphs, etc.) — same (doc_id, para_idx,
    * para) contract as [[paragraphs]]; blank paragraphs are dropped but
    * ordinals still reflect the original positions. */
  private[graft] def paragraphsByDelim(docs: DataFrame, delim: String = "\n"): DataFrame =
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), posexplode(split(col("text"), delim)))
      .toDF("doc_id", "para_idx", "para")
      .filter(length(trim(col("para"))) > 0)

  /** SUBSTRING/PARAGRAPH-level dedup with span-removal accounting — the
    * dedup family document-level LSH cannot express: repeated spans
    * (boilerplate headers, license blocks, the reference's re-scanned
    * caption text, analyze_insta_enhanced.py:1590-1609) embedded in
    * otherwise-distinct documents. The C4/RefinedWeb-style step.
    *
    * Every paragraph becomes a row of the EXISTING dedup-groups pipeline
    * ([[dedupGroupsOf]]: exact md5 collapse → MinHash LSH candidate
    * pairs → connected components → keep-set) keyed by
    * `pid = doc_id · pidMultiplier + para_idx` — so "keep the first
    * occurrence" is the same min-id rule at paragraph granularity, and
    * the whole span graph (not just pairwise candidates) collapses
    * before anything is removed. Output is the number a corpus-prep run
    * reports per document: (doc_id, n_paras, n_removed, chars_removed).
    *
    * Scale: paragraphs multiply the row count by the spans-per-doc
    * factor but shrink per-row text by the same factor, so the shingle/
    * signature work stays linear in corpus bytes; the pair graph and CC
    * loop see paragraph nodes only (near-dup spans), never the corpus.
    * `pidMultiplier` must exceed the max paragraph count per document
    * (2^63 / multiplier bounds doc_id — 1e5 leaves ~9e13 doc ids). */
  def paragraphDedupOf(paras: DataFrame, pidMultiplier: Long = 100000L): DataFrame = {
    val pid = pidFrameOf(paras, pidMultiplier)
    paragraphAccounting(pid, dedupGroupsOf(pid), pidMultiplier)
  }

  /** (pid, text) span frame with the composite key `doc_id ·
    * pidMultiplier + para_idx`; the precondition is ENFORCED with a
    * codegen'd per-row check instead of silently folding a
    * >pidMultiplier-paragraph document's spans into its neighbor's
    * accounting. */
  private def pidFrameOf(paras: DataFrame, pidMultiplier: Long): DataFrame = {
    val guarded = when(col("para_idx") >= pidMultiplier,
      raise_error(concat(
        lit(s"para_idx >= pidMultiplier $pidMultiplier for doc "),
        col("doc_id").cast("string"),
        lit(" — raise pidMultiplier"))).cast("long"))
      .otherwise(col("para_idx"))
    paras.select(
      (col("doc_id") * pidMultiplier + guarded).as("doc_id"),
      col("para").as("text"))
  }

  private def paragraphAccounting(pid: DataFrame, groups: DataFrame,
                                  pidMultiplier: Long): DataFrame =
    groups
      .join(pid.select(col("doc_id"), length(col("text")).as("pchars")), "doc_id")
      .withColumn("odoc", expr(s"doc_id div $pidMultiplier"))
      .groupBy("odoc")
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(!col("is_canonical"), 1)).as("n_removed"),
        coalesce(sum(when(!col("is_canonical"), col("pchars"))), lit(0L))
          .as("chars_removed"))
      .select(col("odoc").as("doc_id"), col("n_paras"), col("n_removed"),
        col("chars_removed"))
      .orderBy("doc_id")

  /** [[paragraphDedupOf]] over 25-token spans of the documents table,
    * with the full index lifecycle: the paragraph reps/band/group
    * tables persist via [[dedupGroupsPersisted]] (the shingle/signature
    * pass and the components fixpoint run once per corpus), and the
    * final per-document ACCOUNTING persists too — it is the artifact
    * consumers actually read, and deriving it inline re-splits every
    * document into spans and re-joins the span-length frame on every
    * query run, which at 100× data made the serve path the suite's one
    * superlinear query (r7 verdict #5). Served, this is a bucketed read. */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val mult = 100000L
    val key = IndexStore.keyOf(dir)
    IndexStore.orBuild(spark, s"dd_paraacct_$key", 32, Seq("doc_id"))({
      val pid = pidFrameOf(paragraphs(Tables.documents(spark, dir)), mult)
      paragraphAccounting(pid,
        dedupGroupsPersisted(spark, s"dd_para_$key", pid), mult)
    }).orderBy("doc_id")
  }

  // ---------------------------------------------- repeated-span removal

  /** The boilerplate sentence [[spanDedup]]'s gate plants (12 tokens —
    * wide enough that 8-token grams land fully inside it). In a real
    * pipeline this is the license header / cookie banner the span pass
    * exists to remove. */
  private[graft] val boilerplate: String =
    "this work is licensed under a creative commons attribution share alike license"

  /** Corpus-wide repeated-SPAN detection — the shuffle-bounded
    * approximation of suffix-array substring dedup (the ExactSubstr
    * pass of Lee et al. 2021): any `w`-token window whose content
    * occurs ≥ 2 times ANYWHERE in the corpus (other documents or the
    * same one) is a repeated span; overlapping/adjacent spans merge
    * into maximal islands; output is per-document removal accounting
    * `(doc_id, n_tokens, n_spans, tokens_in_spans)`.
    *
    * This is the substring-granularity family paragraph dedup
    * ([[paragraphDedupOf]]) cannot express: a license header embedded
    * in otherwise-distinct documents never pays document- or
    * fixed-paragraph-level hashing, but every 8-gram inside it repeats
    * corpus-wide. The reference's caption-repetition rescans
    * (analyze_insta_enhanced.py:1590-1609) are the in-domain miniature.
    *
    * Scale shape: the gram stream (one row per token position, md5 of
    * the window as a fixed-width key) crosses the wire ONCE — the
    * corpus-wide occurrence count is a window count over the gram-hash
    * partition, so there is no second tokenize+explode branch and no
    * self-join; a suffix array at 100 TB is exactly this shuffle in
    * disguise. The island merge windows over MATCHED spans only
    * (repeated grams, a small fraction of positions); its worst case —
    * a fully-duplicated giant document — is bounded by that document's
    * own token count. */
  def spanDedupOf(docs: DataFrame, w: Int = 8): DataFrame =
    spanAccounting(docs, matchedSpansOf(docs, w), w)

  /** Detection pass: every `w`-gram position whose content repeats
    * corpus-wide, as (doc_id, s, e) token spans. This table IS the
    * substring-dedup index of a corpus — deterministic, appendable at
    * ingest — which is why [[spanDedupPersisted]] materializes exactly
    * this frame. */
  private def matchedSpansOf(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toked = docs.select(col("doc_id"),
      split(lower(col("text")), " ").as("toks"))
    val gramCols = (0 until w).map(j => s"toks[i-1+$j]").mkString(", ")
    val occ = toked.filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${w - 1}),
              i -> named_struct('pos', i, 'gh', md5(concat_ws(' ', $gramCols))))""")).as("o"))
      .select(col("doc_id"), col("o.pos").as("s"),
        (col("o.pos") + (w - 1)).as("e"), col("o.gh").as("gh"))
    // corpus-wide occurrence count without re-deriving the gram stream:
    // one exchange on gh, count over the hash partition, filter ≥ 2
    occ
      .withColumn("c", count(lit(1)).over(Window.partitionBy("gh")))
      .filter(col("c") >= 2)
      .select("doc_id", "s", "e")
  }

  /** Island merge + per-doc accounting over a matched-span table —
    * windows over MATCHED spans only (a small fraction of positions). */
  private def spanAccounting(docs: DataFrame, spans: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // merge overlapping/adjacent spans into maximal islands: a span
    // starts a new island iff it begins past the running max end + 1
    val byStart = Window.partitionBy("doc_id").orderBy(col("s"), col("e"))
    val runPrev = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val islands = spans
      .withColumn("ni",
        when(col("s") > coalesce(max(col("e")).over(runPrev), lit(-1)) + 1, 1)
          .otherwise(0))
      .withColumn("iid", sum(col("ni"))
        .over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "iid")
      .agg((max(col("e")) - min(col("s")) + 1).cast("long").as("sz"))
    val perDoc = islands.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("sz")).as("tokens_in_spans"))
    docs.select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_in_spans"), lit(0L)).as("tokens_in_spans"))
      .orderBy("doc_id")
  }

  /** [[spanDedupOf]] over the documents table, with the gate's plant:
    * every 5th document gets [[boilerplate]] appended (the identical
    * plant on both engines — the synthetic corpus has almost no natural
    * 8-gram repetition, so the gate must exercise the removal path). */
  private def plantedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" " + boilerplate))
          .otherwise(lit(""))).as("text"))

  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupOf(plantedDocs(spark, dir))

  /** [[spanDedup]] served from the PERSISTED matched-span index — the
    * production split of the substring pass, mirroring
    * `ta_bm25_topk`/`ta_bm25_persisted`: detection (tokenize → gram
    * stream → corpus-wide occurrence count, the whole-corpus shuffle)
    * runs once per corpus at ingest; per-run serving is the island
    * merge + accounting over matched spans only. Shares
    * `dd_span_dedup`'s oracle — identical results by construction. */
  def spanDedupPersisted(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedDocs(spark, dir)
    val spans = IndexStore.orBuild(spark,
      s"dd_spans_${IndexStore.keyOf(dir)}", 32, Seq("doc_id"))(
      matchedSpansOf(planted, 8))
    spanAccounting(planted, spans, 8)
  }

  /** End-to-end CANONICAL-CORPUS summary — the step that consumes the
    * keep-set: per language, how many documents survive dedup
    * (`is_canonical`) and how many characters the cleaned corpus keeps.
    * This is the number a training-data pipeline actually reports
    * ("corpus shrank 4.2% after near-dedup"); keeping it grouped means
    * the full doc-level keep-set never has to leave the cluster. */
  def dedupCorpusSummary(spark: SparkSession, dir: String): DataFrame =
    summarizeKeepSet(Tables.documents(spark, dir),
      groupsTable(spark, dir))

  /** DEDUP THRESHOLD TUNING SWEEP — how many near-dup pairs would each
    * verify threshold τ admit? Exact Jaccard is computed ONCE per LSH
    * candidate pair, then counted against τ ∈ {40..80}% with the
    * integer cross-multiplied boundary (inter·100 ≥ τ·union — no float
    * decides membership). The τ-calibration curve a dedup deployment
    * reads before committing to a threshold: too low merges topical
    * neighbors, too high leaves templated spam. Counts are over the
    * BAND candidate set (fixed 4×2 geometry) — the sweep tunes the
    * verify knob at that recall envelope.
    *
    * Scale: candidates come from the persisted band table (bucket
    * join, never all-pairs); Jaccard cost is paid once per candidate,
    * the 5-way τ expansion is a map-side explode of the scored pairs. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(Tables.documents(spark, dir))
      .select(col("doc_id"), col("shingles"))
    lshPairsFromBands(docBandsTable(spark, dir))
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .withColumn("inter",
        graft.functions.ArrayOps.intersectCount(col("sh_a"), col("sh_b")))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("inter"))
      .select(explode(array(Seq(40, 50, 60, 70, 80).map(lit): _*)).as("tau_pct"),
        col("inter"), col("uni"))
      .groupBy("tau_pct")
      .agg(count(lit(1)).as("n_candidates"),
        expr("CAST(sum(CASE WHEN inter * 100 >= tau_pct * uni THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_pairs"))
      .select(col("tau_pct").cast("long").as("tau_pct"),
        col("n_candidates"), col("n_pairs"))
      .orderBy("tau_pct")
  }

  /** DEDUP SELECTION-BIAS AUDIT — does the keep-set skew the corpus?
    * Near-dedup preferentially removes boilerplate-heavy and templated
    * documents, which silently shifts the surviving length/content
    * distribution; this compares the kept vs dropped cohorts' document
    * lengths (count, floored mean, min/max) in one result so the shift
    * is visible before training on the survivors. Composes the shared
    * group-label machinery ([[groupsTable]]) — the audit costs one
    * extra |docs|-row join over what dedup already computed.
    *
    * Scale: the groups table is the persisted label index; the audit
    * is one join + a 2-row collapse. */
  def dedupBiasAudit(spark: SparkSession, dir: String): DataFrame =
    dedupBiasAuditOf(Tables.documents(spark, dir), groupsTable(spark, dir))

  /** [[dedupBiasAudit]] over any docs + groups frames (spec entry). */
  private[graft] def dedupBiasAuditOf(docs: DataFrame, groups: DataFrame): DataFrame =
    docs.join(groups.select("doc_id", "is_canonical"), Seq("doc_id"))
      .withColumn("cohort",
        when(col("is_canonical"), lit("kept")).otherwise(lit("dropped")))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(n_chars) AS BIGINT) div count(1)").as("mean_chars"),
        expr("CAST(min(n_chars) AS BIGINT)").as("min_chars"),
        expr("CAST(max(n_chars) AS BIGINT)").as("max_chars"))
      .orderBy("cohort")

  /** [[dedupCorpusSummary]] over any (doc_id, text, lang, n_chars)
    * frame (spec entry point — derives the pair graph inline). */
  def dedupCorpusSummaryOf(docs: DataFrame): DataFrame =
    summarizeKeepSet(docs, dedupGroupsOf(docs))

  private def summarizeKeepSet(docs: DataFrame, groups: DataFrame): DataFrame =
    docs.join(groups.select("doc_id", "is_canonical"), "doc_id")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("is_canonical"), 1)).as("n_kept"),
        coalesce(sum(when(col("is_canonical"), col("n_chars"))), lit(0L))
          .as("chars_kept"))
      .orderBy("lang")

  // ------------------------------------ prefix-filtered set-similarity join

  /** PREFIX-FILTERED SET-SIMILARITY JOIN (the Vernica et al. /
    * PPJoin prefix-filter shape): every document pair whose 3-shingle
    * sets have Jaccard ≥ τ (0.6), computed EXACTLY — without the
    * all-pairs product the definition implies, and unlike the MinHash
    * family without any probabilistic recall loss. The theorem: under
    * any single global token order, two sets with J ≥ τ must share at
    * least one token within their first |s| − ceil(τ·|s|) + 1 tokens
    * (the "prefix"); ordering tokens rarest-first makes those prefixes
    * the least-shared tokens, so the candidate join on prefix tokens
    * pairs only genuinely similar documents. An exact intersect/union
    * verification pass then makes the output IDENTICAL to the
    * quadratic oracle (which is the raw definition, all 124 750 pairs
    * at sf0.01).
    *
    * Scale: one corpus shuffle builds token frequencies, the candidate
    * join is bucketed by PREFIX token only (rare tokens ⇒ small
    * buckets), and verification joins are keyed by doc_id. Never
    * all-pairs; candidate count is output-sensitive, not O(n²).
    * ceil(τ·n) is computed in integer ppm arithmetic so both engines
    * agree bit-for-bit. */
  def setsimJoin(spark: SparkSession, dir: String): DataFrame =
    setsimJoinOf(Tables.documents(spark, dir))

  /** [[setsimJoin]] over any (doc_id, text) frame (spec entry). */
  def setsimJoinOf(docs: DataFrame, tauPpm: Long = 600000L): DataFrame = {
    // parallelism guard + explicit repartitions around the CPU-heavy
    // phases: every stage here is small in BYTES but big in per-row
    // compute (shingle transform, struct explode, per-doc sorts, array
    // intersections), so both a single-file scan and AQE's byte-based
    // post-shuffle coalescing would serialize them onto one task
    // (measured: the whole operator single-threaded, 25 s at sf0.1 →
    // 3 s with the pinned layout). The scan-side repartition only fires
    // when the input is under-parallel — on a real many-file corpus it
    // is a no-op, so no gratuitous corpus shuffle at scale.
    val nParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val base = if (docs.rdd.getNumPartitions < nParts) docs.repartition(nParts) else docs
    // shingle dictionary: checkpointed once — consumed by the frequency
    // count AND the per-doc ordering
    val sh = withShingles(base).select(col("doc_id"), col("shingles"))
      .localCheckpoint()
    val tokFreq = sh.select(explode(col("shingles")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    // rarest-first total order (tf asc, tok asc) COMPILED TO INTEGER
    // IDS: the dictionary window assigns each distinct token its rank
    // in the global order, so every downstream structure — per-doc
    // sorted sets, the candidate join key, the verify arrays — carries
    // 8-byte longs instead of ~20-char shingle strings (collision-free
    // by construction, unlike hashing). The window runs over the
    // token DICTIONARY (distinct shingles), not the corpus; at extreme
    // dictionary sizes swap for the distributed prefix-sum ranking
    // (equidepthHist pattern) — any total order is valid here.
    val dict = tokFreq.withColumn("tid",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("tf", "tok")).cast("long"))
    // per-doc sorted id set + integer-exact prefix length
    // p = n − ceil(τ·n) + 1; ids ascending IS rarest-first.
    // CHECKPOINTED: four consumers read it (both candidate sides, both
    // verify sides) — without the cut, Spark re-runs the corpus scan +
    // frequency shuffle + sort-collect once per consumer
    val ordered = sh
      .select(col("doc_id"), explode(col("shingles")).as("tok"))
      .repartition(nParts, col("tok"))
      .join(dict.select("tok", "tid"), Seq("tok"))
      .repartition(nParts, col("doc_id"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tid"))).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"))
      .withColumn("p",
        col("n") - expr(s"(n * ${tauPpm}L + 999999L) div 1000000L") + lit(1L))
      .localCheckpoint()
    val prefixToks = ordered
      .select(col("doc_id"), col("n"), explode(expr("slice(toks, 1, int(p))")).as("tid"))
    // length filter rides the candidate join: J ≥ τ ⇒ τ·|a| ≤ |b| ∧
    // τ·|b| ≤ |a| — prunes size-incompatible pairs before the exact
    // verify ever materializes their arrays
    val cands = prefixToks.select(col("doc_id").as("doc_a"), col("n").as("na"), col("tid"))
      .join(prefixToks.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("tid")), Seq("tid"))
      .filter(col("doc_a") < col("doc_b") &&
        col("na") * lit(tauPpm) <= col("nb") * lit(1000000L) &&
        col("nb") * lit(tauPpm) <= col("na") * lit(1000000L))
      .select("doc_a", "doc_b").distinct()
      .repartition(nParts, col("doc_a"))
    val full = ordered.select(col("doc_id"), col("toks"), col("n"))
    cands
      .join(full.select(col("doc_id").as("doc_a"), col("toks").as("t_a"),
        col("n").as("size_a")), Seq("doc_a"))
      .join(full.select(col("doc_id").as("doc_b"), col("toks").as("t_b"),
        col("n").as("size_b")), Seq("doc_b"))
      .withColumn("i", size(array_intersect(col("t_a"), col("t_b"))).cast("long"))
      // sets are distinct by construction: |a∪b| = |a| + |b| − |a∩b| —
      // no array_union materialization
      .withColumn("u", col("size_a") + col("size_b") - col("i"))
      // exact predicate (no floor-rounding loss): J ≥ τ ⟺ i·10⁶ ≥ τppm·u
      .filter(col("i") * lit(1000000L) >= lit(tauPpm) * col("u"))
      .select(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"),
        expr("i * 1000000L div u").as("jaccard_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** LSH RECALL EVALUATION — what fraction of the TRUE near-dup pairs
    * (exact Jaccard ≥ τ) does the fixed 4×2 band geometry actually
    * catch? [[thresholdSweep]] tunes the verify knob over the
    * candidate set; this measures the candidate set itself against
    * ground truth — the other half of calibrating an LSH deployment.
    * Ground truth runs on a pinned 500-doc prefix (doc_id < 500, the
    * same audit scale as `dd_setsim_join`'s quadratic proof) so the
    * exact side stays enumerable at ANY corpus size: the filter pushes
    * to the scan and the audit cost is constant while the corpus grows.
    * Exact intersections come from a shared-shingle inverted-index join
    * (count of co-occurring distinct shingles — never a quadratic
    * array-intersect pass); τ membership and recall are integer
    * (cross-multiplied boundary, ppm floor division).
    *
    * A pair with NO shared shingle has J = 0 and cannot reach any
    * τ ≥ 50%, so the inverted-index join loses no true pair. */
  def lshRecallEval(spark: SparkSession, dir: String): DataFrame = {
    val subset = Tables.documents(spark, dir).filter(col("doc_id") < 500)
    val sh = withShingles(subset).select(col("doc_id"), col("shingles"))
      .localCheckpoint() // feeds the exact side twice + the band side
    val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
    val inter = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .as("l").join(sh.select(col("doc_id"), explode(col("shingles")).as("s")).as("r"),
        col("l.s") === col("r.s") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val cand = lshPairsFromBands(minhashBandsOf(subset))
      .withColumn("caught", lit(true))
    val scored = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .join(cand, Seq("doc_a", "doc_b"), "left")
      .withColumn("caught", coalesce(col("caught"), lit(false)))
    // tau axis built UNCONDITIONALLY (no pre-aggregation filter): a tau
    // level with zero true pairs must still emit its row (n_true = 0,
    // recall 0), exactly like the oracle's cross-joined tau list —
    // filtering first made the row count diverge on sparse data, and
    // the unguarded division was a latent div-by-zero on both sides.
    scored
      .select(explode(array(Seq(50, 60, 70, 80).map(lit): _*)).as("tau_pct"),
        col("inter"), col("uni"), col("caught"))
      .groupBy("tau_pct")
      .agg(
        expr("CAST(sum(CASE WHEN inter * 100 >= tau_pct * uni THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_true"),
        expr("CAST(sum(CASE WHEN inter * 100 >= tau_pct * uni AND caught THEN 1 ELSE 0 END) AS BIGINT)")
          .as("n_caught"))
      .select(col("tau_pct").cast("long").as("tau_pct"), col("n_true"), col("n_caught"),
        expr("CASE WHEN n_true > 0 THEN n_caught * 1000000L div n_true ELSE 0L END")
          .as("recall_ppm"))
      .orderBy("tau_pct")
  }

  /** QUALITY-KEEP DEDUP RESOLUTION — the near-dup group walk keeps
    * min-doc_id by default ([[dedupGroups]] `is_canonical`); production
    * dedup usually keeps the BEST member instead. This re-resolves
    * every multi-member group under the keep-longest rule (n_chars
    * desc, doc_id asc tie) and accounts the trade: per group, the
    * keeper, its length, and the char mass dropped — the table a
    * curation review reads before committing to a keep policy.
    *
    * Scale: group labels come from the persisted index
    * ([[groupsTable]] — zero signature/fixpoint work on a hit); one
    * join to the doc-length projection and ONE group aggregate whose
    * argmax is a struct-max (partial-aggregable — no window, no
    * per-group sort). */
  def keepLongest(spark: SparkSession, dir: String): DataFrame = {
    val g = groupsTable(spark, dir).select("doc_id", "group_id", "group_size")
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    g.filter(col("group_size") > 1).join(docs, "doc_id")
      .groupBy("group_id")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("negid"))).as("best"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("group_id"),
        (-col("best.negid")).as("keep_doc_id"),
        col("best.n_chars").as("kept_chars"),
        col("n_members"),
        (col("total_chars") - col("best.n_chars")).as("dropped_chars"))
      .orderBy("group_id")
  }

  /** CROSS-SOURCE DUPLICATION MATRIX — when multiple ingest sources
    * carry the same documents, dedup must pick ONE keeper per content
    * key and the drops redistribute the corpus across sources. The
    * content key is the ORDER-INSENSITIVE bag-of-words fingerprint
    * (md5 over the sorted distinct token set — [[graft.functions
    * .TextAnalysis.fingerprint]]'s signature), which also catches the
    * mirror-reshuffled copies byte-hashing misses. Keep rule: min
    * (source, doc_id) struct — deterministic, no RNG. Output is the
    * (source_kept, source_dup, n_dropped) matrix every multi-source
    * merge reads to see WHO is duplicating WHOM (off-diagonal mass =
    * cross-source collisions; diagonal = within-source dups).
    *
    * Scale: one shuffle on the content key (agg + the keeper join
    * co-partitioned on it), matrix output is |sources|² rows. */
  def crossSourceMatrix(spark: SparkSession, dir: String): DataFrame =
    crossSourceMatrixOf(Tables.documents(spark, dir))

  /** [[crossSourceMatrix]] core over any documents-shaped frame. */
  private[graft] def crossSourceMatrixOf(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(md5(array_join(array_sort(array_distinct(
          split(lower(col("text")), " "))), " ")).as("h"),
        col("source"), col("doc_id"))
    val keeper = docs.groupBy("h")
      .agg(min(struct(col("source"), col("doc_id"))).as("k"),
        count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(col("h"), col("k.source").as("source_kept"),
        col("k.doc_id").as("keep_id"))
    docs.join(keeper, "h")
      .filter(col("doc_id") =!= col("keep_id"))
      .groupBy(col("source_kept"), col("source").as("source_dup"))
      .agg(count(lit(1)).as("n_dropped"))
      .orderBy("source_kept", "source_dup")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_cross_source_matrix" -> crossSourceMatrix _,
    "dd_lsh_recall_eval"     -> lshRecallEval _,
    "dd_keep_longest"        -> keepLongest _,
    "dd_setsim_join"         -> setsimJoin _,
    "dd_exact_summary"       -> exactSummary _,
    "dd_dedup_pipeline"      -> dedupPipelinePairs _,
    "dd_dedup_groups"        -> dedupGroups _,
    "dd_dedup_corpus"        -> dedupCorpusSummary _,
    "dd_dedup_bias_audit"    -> dedupBiasAudit _,
    "dd_threshold_sweep"     -> thresholdSweep _,
    "dd_paragraph_dedup"     -> paragraphDedup _,
    "dd_span_dedup"          -> spanDedup _,
    "dd_span_dedup_persisted" -> spanDedupPersisted _,
    "dd_incremental"         -> incrementalDedup _,
    "dd_jaccard_adjacent"    -> jaccardAdjacent _,
    "dd_containment"         -> containmentPairs _,
    "dd_minhash_lsh_pairs"   -> minhashLshPairs _,
    "dd_split_leakage"       -> splitLeakage _,
    "dd_simhash16"           -> simhash16 _,
    "dd_simhash_hamming"     -> simhashHammingPairs _,
    "dd_simhash_hamming_k2"  -> ((s: SparkSession, d: String) => simhashHammingKPairs(s, d, 2, 60)),
  )

  // Shared oracle fragment: distinct 3-gram shingles per doc (DuckDB lists
  // are 1-based, like Spark element_at) — over any (doc_id, text) source.
  // repeated spans: 1-based start positions; t[i : i+7] is DuckDB's
  // inclusive 8-element slice of the same window Spark's concat_ws
  // builds; islands via the identical running-max-end window. Shared by
  // the scan-time and persisted-index span queries (identical results).
  private val spanDedupOracleSql =
    s"""WITH pl AS (
           SELECT doc_id,
             string_split(lower(text ||
               CASE WHEN doc_id % 5 = 0 THEN ' $boilerplate' ELSE '' END), ' ') AS t
           FROM documents),
         occ AS (
           SELECT doc_id, i AS s, i + 7 AS e,
                  md5(array_to_string(t[i : i+7], ' ')) AS gh
           FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
                 FROM pl WHERE len(t) >= 8)),
         rep AS (SELECT gh FROM occ GROUP BY gh HAVING count(*) >= 2),
         sp AS (SELECT o.doc_id, o.s, o.e FROM occ o JOIN rep USING (gh)),
         isl AS (
           SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                  THEN 1 ELSE 0 END AS ni
           FROM sp),
         isl2 AS (
           SELECT doc_id, s, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
           FROM isl),
         ag AS (SELECT doc_id, iid, max(e) - min(s) + 1 AS sz
                FROM isl2 GROUP BY doc_id, iid),
         pd AS (SELECT doc_id, count(*) AS n_spans,
                       CAST(sum(sz) AS BIGINT) AS tokens_in_spans
                FROM ag GROUP BY doc_id)
         SELECT pl.doc_id AS doc_id, CAST(len(pl.t) AS BIGINT) AS n_tokens,
                CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
                CAST(coalesce(pd.tokens_in_spans, 0) AS BIGINT) AS tokens_in_spans
         FROM pl LEFT JOIN pd ON pl.doc_id = pd.doc_id
         ORDER BY 1"""

  private def shingleCteFrom(src: String) =
    s"""sh AS (
         SELECT doc_id,
           list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
         FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM $src)
         WHERE len(t) >= 3)"""
  private val shingleCte = shingleCteFrom("documents")

  // Shared oracle fragment: md5-family minhash signatures + 4×2 banding
  // over the `sh` CTE (constants from MinHashUtil.A/B).
  private val minhashBandCtes =
    """hs AS (SELECT doc_id,
                  list_transform(shingles,
                    s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hs
                FROM sh),
         sig AS (SELECT doc_id,
           list_min(list_transform(hs, h -> (1103 * h + 12345) % 2147483647)) AS mh0,
           list_min(list_transform(hs, h -> (2171 * h + 3571) % 2147483647)) AS mh1,
           list_min(list_transform(hs, h -> (3079 * h + 8191) % 2147483647)) AS mh2,
           list_min(list_transform(hs, h -> (4397 * h + 131) % 2147483647)) AS mh3,
           list_min(list_transform(hs, h -> (5641 * h + 524287) % 2147483647)) AS mh4,
           list_min(list_transform(hs, h -> (6689 * h + 2053) % 2147483647)) AS mh5,
           list_min(list_transform(hs, h -> (7919 * h + 40961) % 2147483647)) AS mh6,
           list_min(list_transform(hs, h -> (9173 * h + 75181) % 2147483647)) AS mh7
           FROM hs),
         bands AS (
           SELECT doc_id, 0 AS band, CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) AS bucket FROM sig
           UNION ALL
           SELECT doc_id, 1, CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR) FROM sig
           UNION ALL
           SELECT doc_id, 2, CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) FROM sig
           UNION ALL
           SELECT doc_id, 3, CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) FROM sig)"""

  /** Shared oracle fragment for the dedup-groups family: exact-group
    * representatives → LSH candidate pairs → recursive-CTE connected
    * components → g(doc_id, group_id) for every row of `src` (any
    * relation with doc_id + text). Callers prepend `WITH RECURSIVE`
    * (and any CTEs defining `src`). */
  private[graft] def dedupGroupsCtesFrom(src: String): String =
    s"""reps AS (
           SELECT min(doc_id) AS doc_id, min(text) AS text
           FROM $src GROUP BY md5(text)),
         ${shingleCteFrom("reps")},
         $minhashBandCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION ALL SELECT doc_b, doc_a FROM pairs),
         walk AS (
           SELECT doc_id AS node, doc_id AS label FROM reps
           UNION
           SELECT e.dst AS node, w.label AS label
           FROM walk w JOIN edges e ON w.node = e.src),
         comp AS (SELECT node, min(label) AS group_id FROM walk GROUP BY node),
         m AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
               FROM $src),
         g AS (SELECT m.doc_id, c.group_id FROM m JOIN comp c ON m.rep = c.node)"""

  private lazy val dedupGroupsCtes: String =
    s"WITH RECURSIVE ${dedupGroupsCtesFrom("documents")}"

  val oracles: Map[String, String] = Map(
    // exact side from the quadratic list_intersect definition (the
    // engine's inverted-index count must equal it), same bands, same
    // integer tau boundary and ppm recall
    "dd_lsh_recall_eval" ->
      s"""WITH ${shingleCteFrom("(SELECT * FROM documents WHERE doc_id < 500)")},
         $minhashBandCtes,
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id),
         p AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS i,
             CAST(len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS u
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         pc AS (
           SELECT p.i, p.u, (c.doc_a IS NOT NULL) AS caught
           FROM p LEFT JOIN cand c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b),
         g AS (
           SELECT CAST(t.tau AS BIGINT) AS tau_pct,
             CAST(sum(CASE WHEN i * 100 >= t.tau * u THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN i * 100 >= t.tau * u AND caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
           FROM (SELECT unnest([50, 60, 70, 80]) AS tau) t, pc
           GROUP BY 1)
         SELECT tau_pct, n_true, n_caught,
                CASE WHEN n_true > 0 THEN n_caught * 1000000 // n_true
                     ELSE 0 END AS recall_ppm
         FROM g ORDER BY tau_pct""",
    // same group walk; keep-longest re-resolution via a window argmax
    "dd_keep_longest" ->
      s"""$dedupGroupsCtes,
         sz AS (SELECT g.doc_id, g.group_id, d.n_chars,
                  count(*) OVER (PARTITION BY g.group_id) AS gs
                FROM g JOIN documents d ON g.doc_id = d.doc_id),
         r AS (SELECT group_id, doc_id, n_chars,
                 row_number() OVER (PARTITION BY group_id
                   ORDER BY n_chars DESC, doc_id ASC) AS rn
               FROM sz WHERE gs > 1)
         SELECT group_id,
           max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
           CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
           count(*) AS n_members,
           CAST(sum(n_chars) - max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
             AS dropped_chars
         FROM r GROUP BY 1 ORDER BY 1""",
    // same min-(source, doc_id) keeper rule via a window rank
    "dd_cross_source_matrix" ->
      """WITH d AS (SELECT
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS h,
             source, doc_id FROM documents),
         r AS (SELECT h, source, doc_id,
                 row_number() OVER (PARTITION BY h ORDER BY source, doc_id) AS rn,
                 count(*) OVER (PARTITION BY h) AS c
               FROM d),
         k AS (SELECT h, source AS source_kept FROM r WHERE rn = 1 AND c > 1)
         SELECT k.source_kept, r.source AS source_dup, count(*) AS n_dropped
         FROM r JOIN k ON r.h = k.h
         WHERE r.rn > 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // the RAW quadratic definition the prefix filter provably equals:
    // every pair, exact intersection/union, same integer-ppm predicate
    "dd_setsim_join" ->
      s"""WITH $shingleCte,
         pr AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(a.shingles) AS BIGINT) AS size_a,
                  CAST(len(b.shingles) AS BIGINT) AS size_b,
                  CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS i,
                  CAST(len(list_distinct(a.shingles || b.shingles)) AS BIGINT) AS u
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, size_a, size_b,
                CAST(i * 1000000 // u AS BIGINT) AS jaccard_ppm
         FROM pr WHERE i * 1000000 >= 600000 * u
         ORDER BY doc_a, doc_b""",
    "dd_exact_summary" ->
      """WITH g AS (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY md5(text))
         SELECT CAST(SUM(c) AS BIGINT) AS n_docs, count(*) AS n_distinct,
                count(CASE WHEN c > 1 THEN 1 END) AS dup_groups,
                CAST(coalesce(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup_rows
         FROM g""",
    "dd_jaccard_adjacent" ->
      s"""WITH $shingleCte
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(a.shingles) AS n_a, len(b.shingles) AS n_b,
           len(list_intersect(a.shingles, b.shingles)) AS n_common,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
         FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
         ORDER BY doc_a""",
    // same candidate set as the LSH pairs oracle, plus exact intersection
    // counts and the two directional containment ratios
    "dd_containment" ->
      s"""WITH $shingleCte,
         $minhashBandCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id)
         SELECT p.doc_a, p.doc_b,
                CAST(len(sa.shingles) AS BIGINT) AS n_a,
                CAST(len(sb.shingles) AS BIGINT) AS n_b,
                CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS n_common,
                CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                  / CAST(len(sa.shingles) AS DOUBLE) AS containment_a,
                CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                  / CAST(len(sb.shingles) AS DOUBLE) AS containment_b
         FROM pairs p JOIN sh sa ON p.doc_a = sa.doc_id
                      JOIN sh sb ON p.doc_b = sb.doc_id
         ORDER BY doc_a, doc_b""",
    "dd_minhash_lsh_pairs" ->
      s"""WITH $shingleCte,
         $minhashBandCtes
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id < b.doc_id
         ORDER BY doc_a, doc_b""",
    // same band candidates ⋈ the ta_split_assign md5-bucket rule
    "dd_split_leakage" ->
      s"""WITH $shingleCte,
         $minhashBandCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id),
         sp AS (
           SELECT doc_id,
             CASE WHEN bkt < 90 THEN 'train'
                  WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split
           FROM (
             SELECT doc_id,
               list_reduce([strpos('0123456789abcdef', c) - 1
                            FOR c IN string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), '')],
                           (a, v) -> a * 16 + v) % 100 AS bkt
             FROM documents))
         SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
         FROM pairs p
         JOIN sp sa ON p.doc_a = sa.doc_id
         JOIN sp sb ON p.doc_b = sb.doc_id
         WHERE sa.split <> sb.split
         ORDER BY doc_a, doc_b""",
    "dd_dedup_pipeline" ->
      s"""WITH reps AS (
           SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups,
                  min(text) AS text
           FROM documents GROUP BY md5(text)),
         ${shingleCteFrom("reps")},
         $minhashBandCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id)
         SELECT p.doc_a, p.doc_b, ra.n_dups AS dups_a, rb.n_dups AS dups_b
         FROM pairs p
         JOIN reps ra ON p.doc_a = ra.doc_id
         JOIN reps rb ON p.doc_b = rb.doc_id
         ORDER BY doc_a, doc_b""",
    // components via a recursive CTE: walk enumerates (node, label) for
    // every label that can reach node; min per node = the component id —
    // the declarative mirror of the Spark side's label propagation
    "dd_dedup_groups" ->
      s"""$dedupGroupsCtes,
         sizes AS (SELECT group_id, count(*) AS group_size FROM g GROUP BY group_id)
         SELECT g.doc_id, g.group_id, s.group_size,
                g.doc_id = g.group_id AS is_canonical
         FROM g JOIN sizes s ON g.group_id = s.group_id
         ORDER BY doc_id""",
    // paragraph spans as rows of the SAME groups machinery: p0/pe/pp
    // build the 25-token spans with pid = doc_id*1e5 + ordinal, then the
    // shared reps→pairs→recursive-walk CTEs close the span graph and the
    // final aggregate folds the keep-set back to per-document accounting
    "dd_paragraph_dedup" ->
      s"""WITH RECURSIVE p0 AS (
           SELECT doc_id, string_split(text, ' ') AS t
           FROM documents WHERE length(text) > 0),
         pe AS (SELECT doc_id, t, unnest(range(0, (len(t) + 24) // 25)) AS i FROM p0),
         pp AS (SELECT doc_id * 100000 + i AS doc_id,
                       array_to_string(t[i*25+1 : i*25+25], ' ') AS text
                FROM pe),
         ${dedupGroupsCtesFrom("pp")},
         pc AS (SELECT doc_id, length(text) AS pchars FROM pp)
         SELECT g.doc_id // 100000 AS doc_id,
                count(*) AS n_paras,
                count(CASE WHEN g.doc_id <> g.group_id THEN 1 END) AS n_removed,
                CAST(coalesce(sum(CASE WHEN g.doc_id <> g.group_id THEN pc.pchars END), 0) AS BIGINT)
                  AS chars_removed
         FROM g JOIN pc ON g.doc_id = pc.doc_id
         GROUP BY 1 ORDER BY doc_id""",
    "dd_span_dedup" -> spanDedupOracleSql,
    // identical semantics served from the persisted matched-span index
    "dd_span_dedup_persisted" -> spanDedupOracleSql,
    // same band candidates, same exact intersections, same integer
    // cross-multiplied tau boundary per curve point
    "dd_threshold_sweep" ->
      s"""WITH $shingleCte,
         $minhashBandCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
           WHERE a.doc_id < b.doc_id),
         sc AS (
           SELECT CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
                  CAST(len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS uni
           FROM pairs p
           JOIN sh sa ON p.doc_a = sa.doc_id
           JOIN sh sb ON p.doc_b = sb.doc_id),
         taus AS (SELECT unnest([40, 50, 60, 70, 80]) AS tau_pct)
         SELECT CAST(t.tau_pct AS BIGINT) AS tau_pct,
                count(*) AS n_candidates,
                CAST(sum(CASE WHEN sc.inter * 100 >= t.tau_pct * sc.uni
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
         FROM taus t, sc GROUP BY t.tau_pct ORDER BY tau_pct""",
    // same group walk; cohorts split on doc_id = group_id
    "dd_dedup_bias_audit" ->
      s"""$dedupGroupsCtes
         SELECT CASE WHEN g.doc_id = g.group_id THEN 'kept' ELSE 'dropped' END AS cohort,
                count(*) AS n_docs,
                CAST(sum(d.n_chars) AS BIGINT) // count(*) AS mean_chars,
                CAST(min(d.n_chars) AS BIGINT) AS min_chars,
                CAST(max(d.n_chars) AS BIGINT) AS max_chars
         FROM g JOIN documents d ON g.doc_id = d.doc_id
         GROUP BY 1 ORDER BY cohort""",
    "dd_dedup_corpus" ->
      s"""$dedupGroupsCtes
         SELECT d.lang, count(*) AS n_docs,
           count(CASE WHEN g.doc_id = g.group_id THEN 1 END) AS n_kept,
           CAST(coalesce(sum(CASE WHEN g.doc_id = g.group_id THEN d.n_chars END), 0) AS BIGINT)
             AS chars_kept
         FROM g JOIN documents d ON g.doc_id = d.doc_id
         GROUP BY d.lang ORDER BY lang""",
    // one shared bands CTE over ALL docs, sliced by side — batch bands
    // join corpus bands only (batch×corpus, never corpus×corpus)
    "dd_incremental" ->
      s"""WITH $shingleCte,
         $minhashBandCtes,
         ch AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0),
         surv AS (SELECT d.doc_id FROM documents d LEFT JOIN ch ON md5(d.text) = ch.h
                  WHERE d.doc_id % 10 = 0 AND ch.h IS NULL),
         near AS (SELECT DISTINCT s.doc_id
                  FROM bands bb JOIN surv s ON bb.doc_id = s.doc_id
                  JOIN (SELECT DISTINCT band, bucket FROM bands WHERE doc_id % 10 <> 0) cb
                    ON bb.band = cb.band AND bb.bucket = cb.bucket),
         v AS (SELECT d.doc_id,
                 CASE WHEN s.doc_id IS NULL THEN 'dup_exact'
                      WHEN n.doc_id IS NOT NULL THEN 'dup_near'
                      ELSE 'accept' END AS verdict
               FROM documents d LEFT JOIN surv s ON d.doc_id = s.doc_id
               LEFT JOIN near n ON d.doc_id = n.doc_id
               WHERE d.doc_id % 10 = 0)
         SELECT verdict, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM v GROUP BY verdict ORDER BY verdict""",
    "dd_simhash16" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) AS h
               FROM toks WHERE length(tok) > 0),
         votes AS (SELECT doc_id, j,
                     SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                   FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
                   GROUP BY doc_id, j)
         SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 << j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         FROM votes GROUP BY doc_id ORDER BY doc_id""",
    "dd_simhash_hamming" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         hh AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) AS h
               FROM toks WHERE length(tok) > 0),
         votes AS (SELECT doc_id, j,
                     SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                   FROM hh CROSS JOIN (SELECT unnest(range(0, 16)) AS j)
                   GROUP BY doc_id, j),
         sig AS (SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN CAST(1 << j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
                 FROM votes GROUP BY doc_id),
         cand AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
           FROM sig a JOIN sig b
             ON (a.simhash // 256) = (b.simhash // 256) AND a.doc_id < b.doc_id
           UNION
           SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
           FROM sig a JOIN sig b
             ON (a.simhash % 256) = (b.simhash % 256) AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 1
         ORDER BY doc_a, doc_b""",
    "dd_simhash_hamming_k2" -> hammingKOracle(2, 60),
  )

  /** DuckDB oracle for [[simhashHammingKPairs]] — bands generated from
    * the same [[hammingBands]] split the Spark side uses. */
  private def hammingKOracle(k: Int, bits: Int): String = hammingKOracleFrom(
    """toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents)""", k, bits)

  /** [[hammingKOracle]] over any token source: `toksCte` must define a
    * CTE (chain) ending in toks(doc_id, tok). Shared with the multimodal
    * byte-n-gram oracle. */
  private[operators] def hammingKOracleFrom(toksCte: String, k: Int, bits: Int): String =
    s"""WITH ${hammingKCtesFrom(toksCte, k, bits)}
         SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= $k
         ORDER BY doc_a, doc_b"""

  /** The shared token→SimHash→band→candidate chain, ending in
    * `cand(doc_a, doc_b, sa, sb)` plus `sig(doc_id, simhash)` — the two
    * relations both the pair and the group oracles consume. */
  private def hammingKCtesFrom(toksCte: String, k: Int, bits: Int): String = {
    val bandsUnion = hammingBands(bits, k).zipWithIndex.map {
      case ((lo, w), b) =>
        val mask = (1L << w) - 1
        s"SELECT doc_id, simhash, $b AS band, (simhash >> $lo) & $mask AS bkey FROM sig"
    }.mkString("\n           UNION ALL\n           ")
    s"""$toksCte,
         hh AS (SELECT doc_id,
                  CAST('0x' || substr(md5(tok), 1, ${bits / 4}) AS BIGINT) AS h
                FROM toks WHERE length(tok) > 0),
         votes AS (SELECT doc_id, j,
                     SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
                   FROM hh CROSS JOIN (SELECT unnest(range(0, $bits)) AS j)
                   GROUP BY doc_id, j),
         sig AS (SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
                 FROM votes GROUP BY doc_id),
         bands AS (
           $bandsUnion),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""
  }

  /** GROUP closure over the same hamming-pair graph: the recursive-CTE
    * connected components walk (same shape as [[dedupGroupsCtesFrom]])
    * with every signature-bearing doc as a node — the oracle for
    * modalities whose near-dup groups come from SimHash pairs. */
  private[operators] def hammingKGroupsOracleFrom(toksCte: String, k: Int, bits: Int): String =
    s"""WITH RECURSIVE ${hammingKCtesFrom(toksCte, k, bits)},
         pr AS (SELECT doc_a, doc_b FROM cand
                WHERE bit_count(xor(sa, sb)) <= $k),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
                   UNION ALL SELECT doc_b, doc_a FROM pr),
         walk AS (
           SELECT doc_id AS node, doc_id AS label FROM sig
           UNION
           SELECT e.dst AS node, w.label AS label
           FROM walk w JOIN edges e ON w.node = e.src),
         comp AS (SELECT node, min(label) AS group_id FROM walk GROUP BY node),
         sizes AS (SELECT group_id, count(*) AS group_size FROM comp GROUP BY group_id)
         SELECT c.node AS doc_id, c.group_id, s.group_size,
                c.node = c.group_id AS is_canonical
         FROM comp c JOIN sizes s ON c.group_id = s.group_id
         ORDER BY doc_id"""
}
