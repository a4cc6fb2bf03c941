package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weights: target-overlapping documents must rank
  * above raw-only documents, and the selection must be deterministic. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-dsir-test")
  import spark.implicits._

  test("planted target-like docs dominate the resample set") {
    // doc 0 and 13 get a benchmark sentence planted (doc_id % 13 == 0);
    // the rest are raw-only filler with a vocabulary disjoint from the
    // benchmark sentences
    val docs = (0L until 26L).map(i =>
      (i, s"filler$i words about engines and pipelines item${i % 5} " +
          s"rotor stator flange gasket manifold piston camshaft")).toDF("doc_id", "text")
    val got = CorpusOps.dsirWeightsOf(docs, topN = 4).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // the two planted docs must be the top two
    assert(got.take(2).map(_._1).toSet == Set(0L, 13L), s"top: ${got.toSeq}")
    // and strictly above the best raw-only doc
    assert(got(1)._2 > got(2)._2, s"no margin between planted and raw: ${got.toSeq}")
  }

  test("selection is deterministic across repartitionings") {
    val docs = (0L until 40L).map(i =>
      (i, s"alpha$i beta gamma delta${i % 3} epsilon zeta")).toDF("doc_id", "text")
    val a = CorpusOps.dsirWeightsOf(docs, topN = 8).collect().toSeq
    val b = CorpusOps.dsirWeightsOf(docs.repartition(7), topN = 8).collect().toSeq
    assert(a == b)
  }

  test("gated query at sf0.001: planted docs lead the corpus ranking") {
    val got = CorpusOps.dsirWeights(spark, "/root/testdata/sf0.001", topN = 8)
      .collect().map(_.getLong(0))
    val plantedInTop = got.count(_ % 13 == 0)
    assert(plantedInTop >= 4,
      s"expected planted docs to lead the DSIR ranking, top-8: ${got.toSeq}")
  }
}
