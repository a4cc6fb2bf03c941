package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Release-gate operators: CSV round-trip fidelity on adversarial
  * content, k-anonymity audit semantics, min-max scaling bounds. */
class ReleaseGateSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-releasegate-test")
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("RFC-4180 CSV options round-trip commas, quotes, and unicode " +
    "byte-exactly") {
    val nasty = Seq(
      (1L, """plain text"""),
      (2L, """comma, separated, values"""),
      (3L, """a "quoted" phrase"""),
      (4L, """both, "quote, and" comma"""),
      (5L, """unicode: héllo wörld — ∑ ≤ 10³"""),
      (6L, """trailing space """),
      (7L, ""))
    val tmp = java.nio.file.Files.createTempDirectory("csvrt").toString + "/out"
    nasty.toDF("id", "text").write
      .option("header", "true").option("escape", "\"")
      // the writer TRIMS cell whitespace unless pinned off — the exact
      // silent-corruption mode the production options guard against
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(tmp)
    val back = spark.read
      .schema("id LONG, text STRING")
      .option("header", "true").option("escape", "\"").csv(tmp)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    nasty.foreach { case (id, t) =>
      // CSV cannot distinguish empty string from null on read — both
      // arrive as null; every non-empty value must be byte-exact
      val expect = if (t.isEmpty) None else Some(t)
      assert(back(id) === expect, s"row $id")
    }
  }

  test("rel_csv_roundtrip digests equal the parquet originals") {
    val got = graft.sources.Formats.csvRoundtrip(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expect = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("k-anonymity: at-risk classes coarsen to (lang, *) and are " +
    "re-audited — hand-built corpus") {
    // lang=en/src=a: 6 docs (safe); en/b: 2 docs + en/c: 2 docs (both at
    // risk, generalize to en/*: 4 — still < 5, stays at risk);
    // de/d: 3 + de/e: 4 → de/*: 7 → generalization rescues them
    val docs = (
      (1 to 6).map(i => (i.toLong, "en", "a")) ++
      Seq((7L, "en", "b"), (8L, "en", "b"), (9L, "en", "c"), (10L, "en", "c")) ++
      (11 to 13).map(i => (i.toLong, "de", "d")) ++
      (14 to 17).map(i => (i.toLong, "de", "e"))
    ).toDF("doc_id", "lang", "source").withColumn("text", lit("x"))
      .withColumn("n_chars", lit(1L))
    val tmp = java.nio.file.Files.createTempDirectory("kanon").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.functions.TextAnalysis.kAnonymity(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("exact", "en", "a")) === ((6L, false)))
    assert(got(("exact", "en", "b")) === ((2L, true)))
    assert(got(("exact", "de", "d")) === ((3L, true)))
    assert(got(("generalized", "en", "*")) === ((4L, true)))  // 2+2 < 5
    assert(got(("generalized", "de", "*")) === ((7L, false))) // 3+4 >= 5
  }

  test("min-max scaling: multi-valued groups hit both bounds; constant " +
    "groups pin to zero; everything stays in [0, 1e6]") {
    val rows = Aggregations.minmaxScale(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, mn, mx, s) =>
      assert(s >= 0L && s <= 1000000L)
      if (mx == mn) assert(s === 0L)
      else {
        if (n == mn) assert(s === 0L)
        if (n == mx) assert(s === 1000000L)
      }
    }
    // at least one group actually exercises the full range
    assert(rows.exists(_._5 == 1000000L))
  }
}
