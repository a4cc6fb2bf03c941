package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Recall QA for the IVF family: the nprobe knob must be monotone
  * (probing 2 cells can only find a superset-quality answer vs 1), and
  * every IVF hit must be consistent with the brute-force ranking. */
class SimilarityRecallSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-recall-test")
  val dir = "/root/testdata/sf0.01"

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq
  private def topCos(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("vec_id", "cos").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("IVF multi-probe recall is monotone in nprobe and consistent with brute force") {
    val brute = annBrute()
    val bruteIds = topIds(brute).toSet
    val bruteCos = topCos(brute)
    val ivf1 = topIds(Similarity.ivfTopK(spark, dir))
    val ivf2 = topIds(Similarity.ivfProbe2TopK(spark, dir))
    val recall1 = ivf1.count(bruteIds).toDouble / bruteIds.size
    val recall2 = ivf2.count(bruteIds).toDouble / bruteIds.size
    assert(recall2 >= recall1, s"nprobe=2 recall $recall2 < nprobe=1 recall $recall1")
    assert(recall2 > 0.0, "multi-probe found none of the true top-10")
    // consistency: any IVF hit that IS a true top-10 must carry the same
    // cosine the brute-force scorer computed (same quantized math)
    val ivf2Cos = topCos(Similarity.ivfProbe2TopK(spark, dir))
    ivf2Cos.foreach { case (id, c) =>
      bruteCos.get(id).foreach(bc => assert(math.abs(bc - c) < 1e-12, s"vec $id cos drift"))
    }
  }

  test("fitted k-means centroids beat the fixed pre-fit centroids on mean recall@10") {
    // Mean recall over 50 queries (a single query's recall@10 is noise);
    // same quantized integer math as the engine (VectorOpsUtil.quantize).
    import graft.functions.VectorOpsUtil.quantize
    val vecs: Map[Long, Array[Long]] = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(f => quantize(f.toDouble * 1000.0))).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    val ids = vecs.keys.toArray.sorted
    val queries = ids.take(50)

    def meanRecall(cents: Array[Array[Long]], nprobe: Int): (Double, Double) = {
      def rankedCells(v: Array[Long]): Array[Int] =
        cents.zipWithIndex.sortBy { case (c, j) => (-cos(v, c), j) }.map(_._2)
      val assign = ids.map(i => i -> rankedCells(vecs(i))(0)).toMap
      val perQuery = queries.map { qid =>
        val qv = vecs(qid)
        val true10 = ids.filter(_ != qid).sortBy(i => (-cos(vecs(i), qv), i)).take(10).toSet
        val qcells = rankedCells(qv).take(nprobe).toSet
        val cand = ids.filter(i => i != qid && qcells(assign(i)))
        val got = cand.sortBy(i => (-cos(vecs(i), qv), i)).take(10).toSet
        ((got & true10).size / 10.0, cand.length.toDouble)
      }
      (perQuery.map(_._1).sum / perQuery.length, perQuery.map(_._2).sum / perQuery.length)
    }

    val fixed = (1L to 8L).map(vecs).toArray
    val fitted = Similarity.fitIvfCentroids(spark, dir).map(_._2)
    for (nprobe <- Seq(1, 2)) {
      val (fr, fc) = meanRecall(fixed, nprobe)
      val (tr, tc) = meanRecall(fitted, nprobe)
      assert(tr >= fr, s"nprobe=$nprobe: fitted mean recall $tr < fixed $fr")
      assert(tc <= fc * 1.1,
        s"nprobe=$nprobe: fitted candidate count $tc blew past fixed $fc")
    }
  }

  test("multi-query: brute force is the exact ground truth; IVF recall is measured against it") {
    // brute-force multi-query at q_id=0 must agree with the single-query
    // brute force (same corpus, same tie-break) on the first 5 ranks
    val single = topIds(annBrute()).take(5)
    val multi = Similarity.annMultiQueryTopK(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val q0 = multi.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    assert(q0 == single, s"q_id=0 multi-query $q0 != single-query brute $single")
    // every probe answered with exactly k ranks 1..5
    val byQ = multi.groupBy(_._1)
    assert(byQ.keySet == (0L until 20L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1 to 5), s"ranks off for q=$q")
    }
    // IVF multi-query recall@5 vs the exact answer: bounded below, and
    // every IVF hit that is a true hit carries the identical cosine
    val ivf = Similarity.ivfMultiQueryTopK(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val bruteSets = byQ.map { case (q, rows) => q -> rows.map(_._3).toSet }
    val bruteCosByQ = multi.map(m => (m._1, m._3) -> m._4).toMap
    val recalls = ivf.groupBy(_._1).map { case (q, rows) =>
      rows.count(r => bruteSets(q)(r._3)).toDouble / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"IVF multi-query mean recall@5 $mean collapsed")
    ivf.foreach { case (q, _, id, c) =>
      bruteCosByQ.get((q, id)).foreach(bc =>
        assert(math.abs(bc - c) < 1e-12, s"cos drift for ($q,$id)"))
    }
  }

  test("sign-LSH planes refine buckets: 6-plane candidate pairs are a subset of 3-plane") {
    import org.apache.spark.sql.functions._
    def pairs(planes: Int): Set[(Long, Long)] = {
      val b = Similarity.minhashStyleBuckets(spark, dir, planes)
      val a = b.select(col("vec_id").as("id_a"), col("bucket"))
      val c = b.select(col("vec_id").as("id_b"), col("bucket"))
      a.join(c, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val p3 = pairs(3)
    val p6 = pairs(6)
    // the 6-plane bucket extends the 3-plane prefix, so sharing 6 sign
    // bits implies sharing the first 3 — candidates can only shrink
    assert(p6.subsetOf(p3), "6-plane pairs must refine 3-plane pairs")
    assert(p6.size < p3.size,
      s"more planes should prune candidates (3-plane ${p3.size}, 6-plane ${p6.size})")
  }

  test("embedding dedup groups: keep-set invariants hold") {
    val rows = Similarity.embeddingDedupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.length == n, "every vector gets a group row")
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (gid, members) =>
      assert(members.map(_._1).min == gid, s"group id $gid is not the min member")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == gid,
        s"group $gid canonical off")
      assert(members.forall(_._3 == members.length), s"group $gid size column off")
    }
  }

  test("autoPlanes follows the exact integer thresholds b = ceil(log2(n/64)), floor 3") {
    assert(Similarity.autoPlanes(1) == 3)
    assert(Similarity.autoPlanes(512) == 3)   // 64·2^3 = 512 inclusive
    assert(Similarity.autoPlanes(513) == 4)
    assert(Similarity.autoPlanes(2000) == 5)  // the sf0.1 corpus
    assert(Similarity.autoPlanes(1024) == 4)
    assert(Similarity.autoPlanes(1L << 26) == 20) // capped
    // monotone
    val vals = Seq(1L, 100L, 512L, 513L, 5000L, 100000L).map(Similarity.autoPlanes(_))
    assert(vals == vals.sorted)
  }

  private def annBrute() = Similarity.annBruteForceTopK(spark, dir)
}
