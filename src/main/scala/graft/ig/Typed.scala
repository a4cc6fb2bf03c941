package graft.ig

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed API boundary (SURVEY §1.3 engine decision: DataFrames inside
  * the engine, case-class Datasets where consumers want type safety). */
case class CreatorSummary(
    username: String,
    follower_count: Long,
    creator_size: String,
    gender: String,
    creator_type: String,
    tier: String,
    average_engagement_rate: Double,
    total_posts_last_3_months: Long,
    overall_niche: Option[String],
    collaboration_status: Option[String],
    authenticity_score: Long)

object Typed {
  /** The assembled report projected to a typed summary row. */
  def summaries(report: DataFrame): Dataset[CreatorSummary] = {
    import report.sparkSession.implicits._
    report.selectExpr(
      "username", "follower_count", "creator_size", "gender",
      "creator_type", "tier", "average_engagement_rate",
      "total_posts_last_3_months",
      "niche_data.overall_niche AS overall_niche",
      "collaboration_status",
      "fake_follower_analysis.authenticity_score AS authenticity_score")
      .as[CreatorSummary]
  }
}
