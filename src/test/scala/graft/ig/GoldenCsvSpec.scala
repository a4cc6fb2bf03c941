package graft.ig

import org.scalatest.funsuite.AnyFunSuite

/** Cell-level comparison of CsvFlatten against the reference's own
  * stage-3 output: `src/test/resources/golden_output.csv` was produced
  * by running the reference's `create_csv_from_analyzed_json` over its
  * shipped `analyzed.json` (12 creators; we compare the 9 with source
  * data).
  *
  * Comparison rules:
  *  - numeric cells compare numerically (Python writes int 0 where our
  *    schema is double 0.0);
  *  - `brand_mentions` / `location_hashtags` compare as sets (Python-set
  *    pipe-joins);
  *  - the JSON-dump cells are skipped: both sides corrupt their JSON with
  *    the comma→space sanitization but with different separator styles
  *    (json.dumps ", " vs to_json ","); their CONTENT is compared
  *    field-by-field in GoldenFullDiffSpec instead.
  */
class GoldenCsvSpec extends AnyFunSuite {
  import Golden._

  private val skipCols = Set("sponsor_frequency", "personality_traits",
    "profile_insights", "niche_distribution", "niche_confidence_scores",
    "creator_pricing_metrics", "raw_analysis")
  private val setCols = Set("brand_mentions", "location_hashtags")

  /** Minimal RFC-4180 parser (quoted fields, embedded newlines). */
  private def parseCsv(text: String): Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    val row = Seq.newBuilder[String]
    val cell = new StringBuilder
    var inQ = false
    var i = 0
    while (i < text.length) {
      val c = text(i)
      if (inQ) {
        if (c == '"' && i + 1 < text.length && text(i + 1) == '"') { cell += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cell += c
      } else c match {
        case '"' => inQ = true
        case ',' => row += cell.toString; cell.clear()
        case '\n' =>
          row += cell.toString; cell.clear()
          val r = row.result(); row.clear()
          if (r.exists(_.nonEmpty)) out += r
        case '\r' =>
        case other => cell += other
      }
      i += 1
    }
    if (cell.nonEmpty || inQ) { row += cell.toString }
    val last = row.result()
    if (last.nonEmpty && last.exists(_.nonEmpty)) out += last
    out.result()
  }

  test("csv cells match the reference's own stage-3 output") {
    val goldenText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/golden_output.csv").toURI)), "UTF-8")
    val parsed = parseCsv(goldenText)
    val headers = parsed.head
    val goldenRows = parsed.tail.map(r => headers.zip(r).toMap)
      .map(m => m("username") -> m).toMap

    val flat = CsvFlatten.flatten(Report.assemble(profiles, posts, IgClock.golden))
    val cols = flat.columns
    val mineRows = flat.collect().map(r =>
      r.getAs[String]("username") -> cols.zipWithIndex.map { case (c, i) =>
        c -> String.valueOf(r.get(i))
      }.toMap).toMap

    assert(cols.toSeq == headers, "header order drift")
    assert(mineRows.keySet.subsetOf(goldenRows.keySet))
    assert(mineRows.size == 9)

    def numeric(s: String): Option[Double] =
      try Some(s.toDouble) catch { case _: Throwable => None }

    val problems = mineRows.toSeq.sortBy(_._1).flatMap { case (user, mine) =>
      val gold = goldenRows(user)
      cols.filterNot(skipCols).flatMap { c =>
        val (m, g) = (mine(c), gold(c))
        val ok =
          if (setCols(c))
            m.split("\\s*\\|\\s*").filter(_.nonEmpty).toSet ==
              g.split("\\s*\\|\\s*").filter(_.nonEmpty).toSet
          else (numeric(m), numeric(g)) match {
            case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
            case _ => m == g
          }
        if (ok) None else Some(s"$user.$c: mine=[$m] golden=[$g]")
      }
    }
    assert(problems.isEmpty,
      s"${problems.length} cell mismatches:\n${problems.take(25).mkString("\n")}")
  }
}
