package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (builder brief):
  * brute-force cosine top-k baseline + bounded near-dup pair search.
  *
  * Determinism: components are quantized to integer milli-units per
  * element (`round(x*1000)` as long), so dot products and norms are
  * exact integer sums — order-independent and bit-identical across
  * engines; only the final cosine division is floating point, and both
  * engines evaluate the identical expression on identical integers.
  *
  * Scale path: brute-force top-k is a broadcast of the query vector +
  * one pass over the embedding table (no shuffle until the final top-k,
  * which is TakeOrderedAndProject). The LSH-bucketed variant
  * (bucket-join instead of cross product) lives in
  * [[minhashStyleBuckets]] + the Spark-only pipeline; at 1000 executors
  * the per-partition scan dominates, as it should.
  */
object Similarity {

  import graft.functions.VectorOps.{quantDot, quantNormSq}

  /** Brute-force cosine top-10 neighbors of the vec_id=0 query vector. */
  def annBruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", quantDot(col("embedding"), col("qe")))
      .withColumn("na", quantNormSq(col("embedding")))
      .withColumn("nb", quantNormSq(col("qe")))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("rnk", "vec_id", "cos")
      .orderBy("rnk")
  }

  /** Embedding near-dup pairs: top-20 cosine pairs within a bounded id
    * range (the oracle-checkable core of embedding-cosine dedup). */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 60)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("qe"))
    val scored = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", quantDot(col("ea"), col("qe")))
      .withColumn("na", quantNormSq(col("ea")))
      .withColumn("nb", quantNormSq(col("qe")))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select("rnk", "id_a", "id_b", "cos")
      .orderBy("rnk")
  }

  /** Scale path for ANN: sign-LSH bucketing on the first `planes`
    * component signs (axis-aligned hyperplanes — deterministic, so the
    * DuckDB oracle can replicate it bit-for-bit); candidate search only
    * joins within a bucket.
    *
    * Sizing for scale: `planes` is THE knob that keeps the within-bucket
    * self-join linear. With n vectors and 2^b buckets the expected
    * candidate-pair count is ~n²/2^(b+1), so choose
    * b ≈ log2(n / m) for a target bucket size m (constant per executor):
    * then pairs ≈ n·m/2 — linear in n. A fixed b (the old 3-plane/8-
    * bucket shape) degrades to ~n²/8 pairs at 100× data, which is why
    * the plane count must grow with the corpus. */
  def minhashStyleBuckets(spark: SparkSession, dir: String, planes: Int = 3): DataFrame = {
    require(planes >= 1 && planes <= 62, s"planes out of range: $planes")
    val bucketExpr = (1 to planes)
      .map(i => s"cast(element_at(embedding, $i) >= 0 as bigint) * ${1L << (planes - i)}L")
      .mkString(" + ")
    Tables.embeddings(spark, dir).withColumn("bucket", expr(bucketExpr))
  }

  /** IVF-style ANN: 8 fixed coarse centroids (vec_id 1..8), every vector
    * assigned to its nearest centroid, then the query probes ONLY its own
    * cell and ranks candidates by cosine.
    *
    * Scale path: real IVF fits centroids offline (sampled k-means) and
    * ships them to workers as metadata, so the 8-row collect here is the
    * broadcast step, not a data-path collect. With centroids inlined as
    * literals, assignment is a pure per-row argmax projection — the
    * 8x crossJoin + Window.partitionBy(vec_id) shuffle of the expanded
    * table (the round-1 formulation) disappears entirely, and because the
    * projection keeps the quantized vector, the candidate scoring needs no
    * re-join with the source either. Zero Exchange before the final
    * top-k. Tie-break matches the old window (cos desc, cent_id asc):
    * centroids are folded in ascending cent_id order with a strict `>`. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents: Array[(Long, Array[Float])] = e.filter(col("vec_id").between(1, 8))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    // float literals round-trip through their shortest repr, so the
    // codegen'd quantized_dot sees the exact stored components
    val centsLit = cents.map { case (id, fv) =>
      val nb = fv.map { v =>
        val d = v.toDouble * 1000.0
        val q = if (d < 0) -math.floor(-d + 0.5).toLong else math.floor(d + 0.5).toLong
        q * q
      }.sum
      val ce = fv.map(f => s"cast('$f' as float)").mkString(",")
      s"named_struct('cell', ${id}L, 'nb', ${nb}L, 'ce', array($ce))"
    }.mkString("array(", ", ", ")")
    val assigned = e
      .withColumn("na", quantNormSq(col("embedding")))
      .withColumn("cell", expr(
        s"""aggregate(
              transform($centsLit, c -> named_struct(
                'cos', cast(quantized_dot(embedding, c.ce) as double)
                       / (sqrt(cast(na as double)) * sqrt(cast(c.nb as double))),
                'cell', c.cell)),
              named_struct('cos', cast('-Infinity' as double), 'cell', -1L),
              (best, s) -> if(s.cos > best.cos, s, best)).cell"""))
      .select(col("vec_id"), col("cell"), col("embedding"), col("na"))
    val queryCell = assigned.filter(col("vec_id") === 0).select(col("cell").as("qcell"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val candidates = assigned
      .join(broadcast(queryCell), col("cell") === col("qcell"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", quantDot(col("embedding"), col("qe")))
      .withColumn("nb", quantNormSq(col("qe")))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
    candidates.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("rnk", "vec_id", "cell", "cos")
      .orderBy("rnk")
  }

  /** IVF multi-probe (nprobe=2): identical to [[ivfTopK]] except the
    * QUERY probes its two nearest cells — the standard recall knob (data
    * vectors stay assigned to one cell; only the candidate filter
    * widens). Still zero exchanges before the final top-k: assignment is
    * the same literal-centroid fold, and the probe set is a 2-row
    * broadcast. */
  def ivfProbe2TopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents: Array[(Long, Array[Float])] = e.filter(col("vec_id").between(1, 8))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val centsLit = cents.map { case (id, fv) =>
      val nb = fv.map { v =>
        val d = v.toDouble * 1000.0
        val q = if (d < 0) -math.floor(-d + 0.5).toLong else math.floor(d + 0.5).toLong
        q * q
      }.sum
      val ce = fv.map(f => s"cast('$f' as float)").mkString(",")
      s"named_struct('cell', ${id}L, 'nb', ${nb}L, 'ce', array($ce))"
    }.mkString("array(", ", ", ")")
    // per-row scored cells, sorted by (cos desc, cell asc)
    val cellScores =
      s"""array_sort(
            transform($centsLit, c -> named_struct(
              'cos', cast(quantized_dot(embedding, c.ce) as double)
                     / (sqrt(cast(na as double)) * sqrt(cast(c.nb as double))),
              'cell', c.cell)),
            (a, b) -> CASE WHEN a.cos > b.cos THEN -1 WHEN a.cos < b.cos THEN 1
                           WHEN a.cell < b.cell THEN -1 WHEN a.cell > b.cell THEN 1
                           ELSE 0 END)"""
    val assigned = e
      .withColumn("na", quantNormSq(col("embedding")))
      .withColumn("scored", expr(cellScores))
      .withColumn("cell", expr("scored[0].cell"))
      .select(col("vec_id"), col("cell"), col("scored"), col("embedding"), col("na"))
    val queryCells = assigned.filter(col("vec_id") === 0)
      .select(explode(expr("array(scored[0].cell, scored[1].cell)")).as("qcell"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val candidates = assigned
      .join(broadcast(queryCells), col("cell") === col("qcell"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", quantDot(col("embedding"), col("qe")))
      .withColumn("nb", quantNormSq(col("qe")))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
    candidates.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("rnk", "vec_id", "cell", "cos")
      .orderBy("rnk")
  }

  /** Scale-path near-dup: sign-LSH bucket join instead of an all-pairs
    * product — only vectors sharing the `planes`-bit sign bucket are ever
    * paired (the [[minhashStyleBuckets]] building block, oracle-gated at
    * 3 AND 6 planes). Top-20 by cosine keeps the output bounded. At
    * 100 TB, pick planes ≈ log2(n/m) per the sizing note on
    * [[minhashStyleBuckets]] — the bucket join then stays linear in n. */
  def lshNearDup(spark: SparkSession, dir: String, planes: Int = 3): DataFrame = {
    val b = minhashStyleBuckets(spark, dir, planes)
    val a = b.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("bucket"))
    val c = b.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("bucket"))
    val scored = a.join(c, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", quantDot(col("ea"), col("eb")))
      .withColumn("na", quantNormSq(col("ea")))
      .withColumn("nb", quantNormSq(col("eb")))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select("rnk", "bucket", "id_a", "id_b", "cos")
      .orderBy("rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_topk"       -> annBruteForceTopK _,
    "sim_neardup_pairs"  -> nearDupPairs _,
    "sim_ivf_topk"       -> ivfTopK _,
    "sim_ivf_probe2"     -> ivfProbe2TopK _,
    "sim_lsh_neardup"    -> ((s: SparkSession, d: String) => lshNearDup(s, d, 3)),
    "sim_lsh_neardup6"   -> ((s: SparkSession, d: String) => lshNearDup(s, d, 6)),
  )

  /** DuckDB oracle for [[lshNearDup]] at any plane count — generated from
    * the same bucket formula the Spark side uses. */
  private def lshOracle(planes: Int): String = {
    val bucketSql = (1 to planes)
      .map(i => s"CAST(embedding[$i] >= 0 AS BIGINT) * ${1L << (planes - i)}")
      .mkString(" + ")
    s"""WITH bk AS (SELECT vec_id, embedding, $bucketSql AS bucket
               FROM embeddings),
         pr AS (SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
                  unnest(a.embedding) AS x, unnest(b.embedding) AS y
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         d AS (SELECT bucket, id_a, id_b,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM pr GROUP BY bucket, id_a, id_b),
         s AS (SELECT bucket, id_a, id_b,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
               FROM d),
         r AS (SELECT bucket, id_a, id_b, cos,
                 row_number() OVER (ORDER BY cos DESC, id_a ASC, id_b ASC) AS rnk FROM s)
         SELECT rnk, bucket, id_a, id_b, cos FROM r WHERE rnk <= 20 ORDER BY rnk"""
  }

  private def duckCos(aExpr: String) =
    s"""CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"""

  val oracles: Map[String, String] = Map(
    "sim_ivf_topk" ->
      """WITH cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
                        WHERE vec_id BETWEEN 1 AND 8),
         pairs AS (SELECT e.vec_id, c.cent_id,
                     unnest(e.embedding) AS x, unnest(c.ce) AS y
                   FROM embeddings e, cents c),
         d AS (SELECT vec_id, cent_id,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM pairs GROUP BY vec_id, cent_id),
         assigned AS (
           SELECT vec_id, cent_id AS cell FROM (
             SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
                 cent_id ASC) AS rn
             FROM d) WHERE rn = 1),
         qcell AS (SELECT cell FROM assigned WHERE vec_id = 0),
         cand AS (SELECT a.vec_id, a.cell FROM assigned a, qcell
                  WHERE a.cell = qcell.cell AND a.vec_id <> 0),
         qp AS (SELECT c.vec_id, c.cell, unnest(e.embedding) AS x, unnest(q.embedding) AS y
                FROM cand c
                JOIN embeddings e ON e.vec_id = c.vec_id
                JOIN embeddings q ON q.vec_id = 0),
         qd AS (SELECT vec_id, cell,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM qp GROUP BY vec_id, cell),
         s AS (SELECT vec_id, cell,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
               FROM qd),
         r AS (SELECT vec_id, cell, cos,
                 row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk FROM s)
         SELECT rnk, vec_id, cell, cos FROM r WHERE rnk <= 10 ORDER BY rnk""",
    "sim_ivf_probe2" ->
      """WITH cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
                        WHERE vec_id BETWEEN 1 AND 8),
         pairs AS (SELECT e.vec_id, c.cent_id,
                     unnest(e.embedding) AS x, unnest(c.ce) AS y
                   FROM embeddings e, cents c),
         d AS (SELECT vec_id, cent_id,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM pairs GROUP BY vec_id, cent_id),
         ranked AS (
           SELECT vec_id, cent_id AS cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY
               CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
               cent_id ASC) AS rn
           FROM d),
         assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
         qcells AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
         cand AS (SELECT a.vec_id, a.cell FROM assigned a JOIN qcells q
                  ON a.cell = q.cell WHERE a.vec_id <> 0),
         qp AS (SELECT c.vec_id, c.cell, unnest(e.embedding) AS x, unnest(q.embedding) AS y
                FROM cand c
                JOIN embeddings e ON e.vec_id = c.vec_id
                JOIN embeddings q ON q.vec_id = 0),
         qd AS (SELECT vec_id, cell,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM qp GROUP BY vec_id, cell),
         s AS (SELECT vec_id, cell,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
               FROM qd),
         r AS (SELECT vec_id, cell, cos,
                 row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk FROM s)
         SELECT rnk, vec_id, cell, cos FROM r WHERE rnk <= 10 ORDER BY rnk""",
    "sim_ann_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         p AS (SELECT vec_id, unnest(embedding) AS x, unnest(qe) AS y
               FROM embeddings, q WHERE vec_id <> 0),
         d AS (SELECT vec_id,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM p GROUP BY vec_id),
         s AS (SELECT vec_id,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
               FROM d),
         r AS (SELECT vec_id, cos,
                 row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk FROM s)
         SELECT rnk, vec_id, cos FROM r WHERE rnk <= 10 ORDER BY rnk""",
    "sim_lsh_neardup" -> lshOracle(3),
    "sim_lsh_neardup6" -> lshOracle(6),
    "sim_neardup_pairs" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60),
         pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  unnest(a.embedding) AS x, unnest(b.embedding) AS y
                FROM e a JOIN e b ON a.vec_id < b.vec_id),
         d AS (SELECT id_a, id_b,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS dot,
                 SUM(CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS na,
                 SUM(CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)
                   * CAST(round(CAST(y AS DOUBLE) * 1000.0) AS BIGINT)) AS nb
               FROM pr GROUP BY id_a, id_b),
         s AS (SELECT id_a, id_b,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
               FROM d),
         r AS (SELECT id_a, id_b, cos,
                 row_number() OVER (ORDER BY cos DESC, id_a ASC, id_b ASC) AS rnk FROM s)
         SELECT rnk, id_a, id_b, cos FROM r WHERE rnk <= 20 ORDER BY rnk""",
  )
}
