package graft.ig

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EP-1 relational operators vs hand-computed reference behavior. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-ingest-test")
  import spark.implicits._

  test("username extraction matches get_username for url shapes") {
    val cases = Seq(
      "https://www.instagram.com/inesalex.ugc/" -> "inesalex.ugc",
      "https://www.instagram.com/user_1" -> "user_1",
      // trailing "/?query": Python's last segment is "?hl=en" whose
      // pre-'?' part is "" — the reference returns "" here too
      " https://www.instagram.com/u2/?hl=en " -> "",
      "https://www.instagram.com/a/b/" -> "b")
    val got = cases.map(_._1).toDF("url")
      .select(Ingest.usernameFromUrl(col("url"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("politeness wait matches the reference formula over the shipped profiles") {
    import org.apache.spark.sql.functions._
    val profiles = Instagram.readProfiles(spark, Instagram.profilesGlob())
    val rows = profiles.select(
      col("username"),
      col("follower_count"), col("media_count"),
      Ingest.politenessWait(col("follower_count"), col("media_count")).as("wait"))
      .collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val expected = math.min(
        r.getLong(1).toDouble / 500000.0 + r.getLong(2).toDouble / 5000.0, 1.0)
      assert(r.getDouble(3) == expected, s"${r.getString(0)}: ${r.getDouble(3)} != $expected")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("resume keeps un-normalized originals and skips normalized matches") {
    val input = Seq("https://x.com/a/", "https://x.com/b", " https://x.com/c/ ").toDF("url")
    val done = Seq("https://x.com/a", "  https://x.com/c").toDF("url")
    val got = Ingest.urlsToProcess(input, done).as[String].collect()
    assert(got.toSeq == Seq("https://x.com/b"))
  }

  test("failure channel filters unsuccessful urls") {
    val results = Seq(("u1", true), ("u2", false), ("u3", false)).toDF("url", "success")
    assert(Ingest.failedUrls(results).as[String].collect().sorted.toSeq == Seq("u2", "u3"))
  }

  test("done-log append + resume is idempotent end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_done").toString
    val batch1 = Seq("https://x.com/a/", "https://x.com/b").toDF("url")
    Ingest.appendDone(batch1, s"$dir/done")
    val input = Seq("https://x.com/a", "https://x.com/b/", "https://x.com/c").toDF("url")
    val done = Ingest.readUrls(spark, s"$dir/done")
    val remaining = Ingest.urlsToProcess(input, done).as[String].collect()
    assert(remaining.toSeq == Seq("https://x.com/c"))
    // append again (re-run) → still idempotent
    Ingest.appendDone(batch1, s"$dir/done")
    val remaining2 = Ingest.urlsToProcess(input,
      Ingest.readUrls(spark, s"$dir/done")).as[String].collect()
    assert(remaining2.toSeq == Seq("https://x.com/c"))
  }
}
