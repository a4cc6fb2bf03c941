package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PII scrubber's redaction semantics on crafted contact strings —
  * every reference phone-pattern shape, emails in context, and clean
  * text passing through untouched. */
class PiiScrubSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-pii-test")
  import spark.implicits._

  private def scrub(texts: Seq[String]): Seq[(String, Int, Int)] = {
    val emailPat = graft.ig.Extraction.emailPattern
    val phonePat = graft.ig.Extraction.phonePatterns.mkString("|")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("n_emails", size(regexp_extract_all(col("text"), lit(emailPat), lit(0))))
      .withColumn("s1", regexp_replace(col("text"), emailPat, "[EMAIL]"))
      .withColumn("n_phones", size(regexp_extract_all(col("s1"), lit(phonePat), lit(0))))
      .withColumn("scrubbed", regexp_replace(col("s1"), phonePat, "[PHONE]"))
      .orderBy("doc_id")
      .select("scrubbed", "n_emails", "n_phones")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
  }

  test("emails and phones redact; clean text is untouched") {
    val got = scrub(Seq(
      "write to jane.doe+spam@sub.example.co.uk for details",
      "call +1 (212) 555-0134 or 646.555.0188 today",
      "mixed: a@b.io and +4915123456789 in one line",
      "no pii here just words and the number 42"))
    assert(got(0) == (("write to [EMAIL] for details", 1, 0)))
    assert(got(1)._1 == "call [PHONE] or [PHONE] today" && got(1)._3 == 2)
    assert(got(2) == (("mixed: [EMAIL] and [PHONE] in one line", 1, 1)))
    assert(got(3) == (("no pii here just words and the number 42", 0, 0)))
  }

  test("every reference phone-pattern shape is caught") {
    val got = scrub(Seq(
      "p1 +91 22 5555 1234 end",
      "p2 +12125550134 end",
      "p3 (415) 555-2671 end",
      "p5 080-4567-890123 end"))
    got.foreach(g => assert(g._1.contains("[PHONE]"), s"not scrubbed: $g"))
  }
}
