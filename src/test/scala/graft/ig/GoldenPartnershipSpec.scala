package graft.ig

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden replay for detect_paid_partnerships + identify_collaborations
  * (including the reference's timeline-TypeError and empty
  * sponsor_frequency quirks — see Partnerships Scaladoc). */
class GoldenPartnershipSpec extends AnyFunSuite {
  import Golden._

  lazy val pd = Partnerships.partnershipData(posts, profiles, IgClock.golden)
  lazy val cd = Partnerships.collaborations(posts, IgClock.golden)

  test("partnership scalars match golden") {
    val g = golden.select(col("username").as("k"), col("partnership_data.*"))
    val m = pd.withColumnRenamed("creator_key", "k")
    val joined = m.alias("m").join(g.alias("g"), "k").collect2("k",
      "m.has_paid_partnerships", "g.has_paid_partnerships",
      "m.total_sponsored_posts", "g.total_sponsored_posts",
      "m.collaboration_score", "g.collaboration_score",
      "m.avg_sponsored_engagement", "g.avg_sponsored_engagement",
      "m.avg_organic_engagement", "g.avg_organic_engagement")
    assert(joined.length == 9, s"expected 9, got ${joined.length}")
    joined.foreach { r =>
      val k = r.getString(0)
      assert(r.getBoolean(1) == r.getBoolean(2), s"$k has_paid")
      assert(r.getLong(3) == r.getLong(4), s"$k n_sponsored: ${r.getLong(3)} vs ${r.getLong(4)}")
      assert(r.getLong(5) == r.getLong(6), s"$k collab_score: ${r.getLong(5)} vs ${r.getLong(6)}")
      assert(math.abs(r.getDouble(7) - r.getDouble(8)) < 1e-9, s"$k avg_sponsored")
      assert(math.abs(r.getDouble(9) - r.getDouble(10)) < 1e-9, s"$k avg_organic")
    }
  }

  test("engagement comparison + timeline + sponsor_frequency match golden") {
    val g = golden.select(col("username").as("k"),
      col("partnership_data.engagement_comparison").as("g_cmp"),
      col("partnership_data.collaboration_timeline").as("g_tl"))
    val rows = pd.withColumnRenamed("creator_key", "k")
      .select(col("k"), col("engagement_comparison").as("m_cmp"),
        size(col("collaboration_timeline")).as("m_tl_n"),
        size(col("sponsor_frequency")).as("m_freq_n"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      val mc = r.getAs[Row]("m_cmp"); val gc = r.getAs[Row]("g_cmp")
      // golden {} parses as a struct of nulls; our null struct ≡ that
      if (mc == null) {
        assert(gc == null || gc.getAs[Any]("sponsored_vs_organic_ratio") == null, s"$k cmp")
      } else {
        assert(mc.getAs[Double]("sponsored_vs_organic_ratio") ==
          gc.getAs[Double]("sponsored_vs_organic_ratio"), s"$k ratio")
        assert(mc.getAs[Boolean]("sponsored_performs_better") ==
          gc.getAs[Boolean]("sponsored_performs_better"), s"$k better")
      }
      // golden timeline is [] for every creator (TypeError quirk)
      assert(r.getAs[Int]("m_tl_n") == 0, s"$k timeline should be empty")
      assert(r.getAs[Int]("m_freq_n") == 0, s"$k sponsor_frequency should be empty")
    }
  }

  test("brand mentions match golden as sets") {
    val g = golden.select(col("username").as("k"),
      col("partnership_data.brand_mentions").as("g_bm"))
    val rows = pd.withColumnRenamed("creator_key", "k")
      .select(col("k"), col("brand_mentions")).join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      val mine = r.getSeq[String](r.fieldIndex("brand_mentions")).toSet
      val gold = r.getSeq[String](r.fieldIndex("g_bm")).toSet
      assert(mine == gold, s"$k brand_mentions: only-mine=${mine -- gold} only-golden=${gold -- mine}")
    }
  }

  test("sponsored posts match golden (id/code/caption/engagement, in order)") {
    val g = golden.select(col("username").as("k"),
      expr("transform(partnership_data.sponsored_posts, " +
        "p -> struct(p.id, p.code, p.like_count, p.comment_count, p.taken_at, p.total_engagement))")
        .as("g_sp"))
    val rows = pd.withColumnRenamed("creator_key", "k")
      .select(col("k"), expr("transform(sponsored_posts, " +
        "p -> struct(p.id, p.code, p.like_count, p.comment_count, p.taken_at, p.total_engagement))")
        .as("m_sp"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      assert(r.getSeq[Row](r.fieldIndex("m_sp")) == r.getSeq[Row](r.fieldIndex("g_sp")), s"$k sponsored_posts")
    }
  }

  test("collaboration cascade matches golden") {
    val g = golden.select(col("username").as("k"),
      col("collaboration_status").as("g_status"),
      col("total_collaborations").as("g_total"),
      col("recent_collaborations").as("g_recent"),
      col("ugc_examples").as("g_ugc"),
      expr("transform(top_collaboration, c -> struct(c.name, c.count, c.is_recent, c.source))")
        .as("g_collabs"))
    val rows = cd.withColumnRenamed("creator_key", "k")
      .select(col("k"), col("collaboration_status"), col("total_collaborations"),
        col("recent_collaborations"), col("ugc_examples"),
        expr("transform(all_collaborations, c -> struct(c.name, c.count, c.is_recent, c.source))")
          .as("m_collabs"))
      .join(g, "k").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getAs[String]("k")
      assert(String.valueOf(r.getAs[String]("collaboration_status")) ==
        String.valueOf(r.getAs[String]("g_status")), s"$k status")
      assert(r.getAs[Long]("total_collaborations") == r.getAs[Long]("g_total"),
        s"$k total: ${r.getAs[Long]("total_collaborations")} vs ${r.getAs[Long]("g_total")}")
      assert(r.getAs[Long]("recent_collaborations") == r.getAs[Long]("g_recent"), s"$k recent")
      assert(r.getAs[String]("ugc_examples") == r.getAs[String]("g_ugc"), s"$k ugc")
      val mc = r.getSeq[Row](r.fieldIndex("m_collabs")); val gc = r.getSeq[Row](r.fieldIndex("g_collabs"))
      assert(mc == gc, s"$k collabs:\n mine=$mc\n gold=$gc")
    }
  }

  implicit class RowsOps(df: org.apache.spark.sql.DataFrame) {
    def collect2(cols: String*): Array[Row] = df.select(cols.map(col): _*).collect()
  }
}
