package graft.ig

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact CSV gate: `CsvFlatten.writeCsvPy` must reproduce the
  * reference stage-3's own output (`tools/make_golden_csv.py` fixture)
  * byte for byte — CRLF rows, QUOTE_MINIMAL quoting, CPython json.dumps
  * cells, Python number forms — for the header and all nine creators
  * with source data.
  *
  * As in GoldenJsonBytesSpec, the PYTHONHASHSEED-ordered set fields
  * (brand_mentions / location_hashtags, standalone cells and their
  * copies inside raw_analysis) are canonicalized on BOTH sides: the
  * reference itself orders them differently run to run. */
class GoldenCsvBytesSpec extends AnyFunSuite {
  import Golden._

  /** One CSV record per physical line (no cell contains raw newlines —
    * every string cell went through the comma/newline sanitizers). */
  private def cells(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cell = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { cell += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cell += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cell.toString; cell.clear()
        case other => cell += other
      }
      i += 1
    }
    out += cell.toString
    out.result()
  }

  private def sortPipeJoin(s: String): String =
    if (s.isEmpty) s else s.split(" \\| ", -1).sorted.mkString(" | ")

  /** Canonicalize the set-ordered arrays inside a raw_analysis JSON dump
    * (elements are quoted strings; the separators are the comma→space
    * corrupted `", "` → two spaces). */
  private def sortJsonArray(cell: String, field: String): String = {
    val re = ("(\"" + field + "\": \\[)([^\\]]*)(\\])").r
    re.replaceAllIn(cell, m => {
      val elems = "\"[^\"]*\"".r.findAllIn(m.group(2)).toSeq.sorted
      java.util.regex.Matcher.quoteReplacement(
        m.group(1) + elems.mkString("  ") + m.group(3))
    })
  }

  private def canonRow(header: Seq[String], row: Seq[String]): Seq[String] =
    header.zip(row).map {
      case (n, v) if n == "brand_mentions" || n == "location_hashtags" =>
        sortPipeJoin(v)
      case ("raw_analysis", v) =>
        sortJsonArray(sortJsonArray(v, "brand_mentions"), "location_hashtags")
      case (_, v) => v
    }

  private lazy val goldenText = java.nio.file.Files.readString(
    java.nio.file.Paths.get("src/test/resources/golden_output.csv"))

  private lazy val mineText = {
    val p = "/tmp/graft_bytes_influencers.csv"
    CsvFlatten.writeCsvPy(Report.assemble(profiles, posts, IgClock.golden), p)
    java.nio.file.Files.readString(java.nio.file.Paths.get(p))
  }

  test("CRLF rows, trailing terminator") {
    assert(goldenText.endsWith("\r\n") && mineText.endsWith("\r\n"))
    assert(!mineText.replace("\r\n", "").contains("\r"))
  }

  test("header row is byte-identical") {
    assert(mineText.split("\r\n")(0) == goldenText.split("\r\n")(0))
  }

  test("every creator row is byte-identical modulo set-order fields") {
    val gLines = goldenText.split("\r\n").filter(_.nonEmpty)
    val mLines = mineText.split("\r\n").filter(_.nonEmpty)
    val header = cells(gLines(0))
    val gRows = gLines.drop(1).map(l => { val c = cells(l); c.head -> c }).toMap
    val mRows = mLines.drop(1).map(l => { val c = cells(l); c.head -> c })
    assert(mRows.length == 9)
    val problems = mRows.toSeq.flatMap { case (user, mine) =>
      val golden = gRows.getOrElse(user, sys.error(s"unknown creator $user"))
      val (g, m) = (canonRow(header, golden), canonRow(header, mine))
      header.indices.filter(i => g(i) != m(i)).take(3).map(i =>
        s"$user.${header(i)}:\n  G:<${g(i).take(400)}>\n  M:<${m(i).take(400)}>")
    }
    assert(problems.isEmpty,
      s"${problems.size} cell diffs:\n${problems.take(8).mkString("\n")}")
  }
}
