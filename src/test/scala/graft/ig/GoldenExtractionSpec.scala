package graft.ig

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden replay for the profile-level scalar extractions. */
class GoldenExtractionSpec extends AnyFunSuite {
  import Golden._

  lazy val ex = Extraction.enrich(profiles, posts)

  test("scalar extraction fields match golden") {
    val g = golden.select(col("username").as("k"),
      col("email").as("g_email"), col("phone_number").as("g_phone_number"),
      col("first_name").as("g_first_name"), col("last_name").as("g_last_name"),
      col("creator_size").as("g_creator_size"), col("gender").as("g_gender"),
      col("ig_account_type").as("g_ig_account_type"),
      col("creator_type").as("g_creator_type"), col("tier").as("g_tier"),
      col("profile_picture").as("g_profile_picture"),
      col("business_category").as("g_business_category"))
    val m = ex.select(col("creator_key").as("k"), col("email"), col("phone_number"),
        col("first_name"), col("last_name"), col("creator_size"), col("gender"),
        col("ig_account_type"), col("creator_type"), col("tier"),
        col("profile_picture"), col("category").as("business_category"))
      .join(g, "k").collect()
    assert(m.length == 9, s"expected 9, got ${m.length}")
    m.foreach { r =>
      val k = r.getAs[String]("k")
      Seq("email", "phone_number", "first_name", "last_name", "creator_size",
        "gender", "ig_account_type", "creator_type", "tier", "profile_picture",
        "business_category").foreach { c =>
        val a = r.getAs[Any](c); val b = r.getAs[Any](s"g_$c")
        assert(String.valueOf(a) == String.valueOf(b), s"$k.$c: mine=$a golden=$b")
      }
    }
  }

  test("social links match golden") {
    val m = ex.select(col("creator_key").as("k"), col("social_links"))
      .join(golden.select(col("username").as("k"), col("social_links").as("g")), "k")
      .collect()
    assert(m.length == 9)
    m.foreach { r =>
      val k = r.getAs[String]("k")
      val mine = r.getAs[Row]("social_links"); val g = r.getAs[Row]("g")
      Seq("tiktok", "youtube", "linktree").foreach { p =>
        val a = mine.getAs[String](p)
        val b = g.getAs[String](p)
        assert(String.valueOf(a) == String.valueOf(b), s"$k.$p: mine=$a golden=$b")
      }
    }
  }

  test("pricing metrics match golden") {
    val m = ex.select(col("creator_key").as("k"), col("creator_pricing_metrics"))
      .join(golden.select(col("username").as("k"), col("creator_pricing_metrics").as("g")), "k")
      .collect()
    assert(m.length == 9)
    m.foreach { r =>
      val k = r.getAs[String]("k")
      val mine = r.getAs[Row]("creator_pricing_metrics"); val g = r.getAs[Row]("g")
      Seq("estimated_roi", "impressions_visibility", "time_15_seconds",
        "time_30_seconds", "time_60_seconds", "time_1_to_5_minutes",
        "time_greater_than_5_minutes").foreach { p =>
        val a = mine.getAs[Any](p)
        val b = g.getAs[Any](g.fieldIndex(p))
        assert(String.valueOf(a) == String.valueOf(b), s"$k.$p: mine=$a golden=$b")
      }
    }
  }
}
