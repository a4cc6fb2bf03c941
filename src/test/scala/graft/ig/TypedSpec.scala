package graft.ig

import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset boundary: encoder round-trip + values consistent with
  * the untyped report. */
class TypedSpec extends AnyFunSuite {
  import Golden._

  test("typed summaries round-trip the report values") {
    val report = Report.assemble(profiles, posts, IgClock.golden)
    val rows = Typed.summaries(report).collect()
    assert(rows.length == 9)
    // sorted by ER desc like the report
    val ers = rows.map(_.average_engagement_rate)
    assert(ers.sameElements(ers.sortBy(-_)))
    rows.foreach { r =>
      assert(r.username.nonEmpty)
      assert(r.authenticity_score >= 0 && r.authenticity_score <= 100)
      assert(Set("UGC Creator", "Social Media Influencer").contains(r.creator_type))
    }
    // typed transformations compose
    import spark.implicits._
    val byNiche = Typed.summaries(report)
      .filter(_.overall_niche.isDefined)
      .groupByKey(_.overall_niche.get)
      .count().collect().toMap
    assert(byNiche.values.sum <= 9 && byNiche.values.sum > 0)
  }
}
