package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Index maintenance: base-persisted + delta-at-query-time serving must
  * be row-identical to the full rebuild, and the query-time plan must
  * tokenize/assign ONLY the delta slice (one documents/embeddings scan,
  * the base coming off the stored bucketed table). */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-index-maint-test")

  private val dir = "/root/testdata/sf0.001"

  test("bm25Incremental serves rows identical to the full-corpus bm25TopK") {
    val full = graft.functions.TextAnalysis.bm25TopK(spark, dir).collect().toSeq
    val inc = graft.functions.TextAnalysis.bm25Incremental(spark, dir).collect().toSeq
    assert(inc == full)
  }

  test("bm25Incremental tokenizes only the delta: one documents scan in the plan") {
    val df = graft.functions.TextAnalysis.bm25Incremental(spark, dir)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val docScans = "documents\\.parquet".r.findAllIn(plan).length
    assert(docScans >= 1, "delta slice must scan the documents table")
    // the base postings come from the stored bucketed table, never from
    // re-tokenizing documents: exactly one delta-side scan group remains
    val deltaFilter = plan.contains("(doc_id#") || plan.contains("% 7)")
    assert(deltaFilter, s"delta scan should filter doc_id % 7: $plan")
    val baseTable = "bm25_base_postings_".r.findAllIn(plan).nonEmpty
    assert(baseTable, "base side must read the persisted postings table")
  }

  test("ivfMultiQueryIncremental serves rows identical to ivfMultiQueryTopK") {
    val full = Similarity.ivfMultiQueryTopK(spark, dir).collect().toSeq
    val inc = Similarity.ivfMultiQueryIncremental(spark, dir).collect().toSeq
    assert(inc == full)
  }

  test("ivf incremental assigns only the delta at query time") {
    val df = Similarity.ivfMultiQueryIncremental(spark, dir)
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    // base side: stored bucketed assignment table; delta side: one
    // embeddings scan filtered to vec_id % 7 = 0
    assert("ivf_base_assign_".r.findAllIn(plan).nonEmpty,
      "base side must read the persisted assignment table")
    // the union's delta leg appears twice (candidate side + probe-query
    // side both slice it), but both scans are the delta slice — a FULL
    // reassignment would read embeddings withOUT the stored base table
    // in the same plan, which the assertion above excludes
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embScans <= 2, s"only delta-slice embeddings scans expected, got $embScans")
  }
}
