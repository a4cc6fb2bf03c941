package graft.ig

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injected clock (SURVEY §7.4 risk 2): the reference derives 90/300-day
  * cutoffs and all date strings from `datetime.now()` in the machine's
  * local timezone (reference analyze_insta_enhanced.py:80,1121,1281,1502,
  * 1558,1612). Golden outputs are only reproducible with a frozen clock,
  * so every pipeline entry takes an IgClock instead of calling
  * `current_timestamp()`.
  *
  * @param nowEpoch frozen "now" as epoch seconds
  * @param zone     IANA zone for hour/date derivations (reference used the
  *                 producing machine's local zone; engine default is UTC)
  */
final case class IgClock(nowEpoch: Long, zone: String = "UTC") {
  /** Epoch-seconds cutoff `days` before now (timedelta semantics). */
  def cutoff(days: Int): Long = nowEpoch - days.toLong * 86400L

  /** Local calendar date string (yyyy-MM-dd) of an epoch-seconds column. */
  def localDate(epochSec: Column): Column =
    date_format(from_utc_timestamp(timestamp_seconds(epochSec), zone), "yyyy-MM-dd")

  /** Local hour-of-day of an epoch-seconds column. */
  def localHour(epochSec: Column): Column =
    hour(from_utc_timestamp(timestamp_seconds(epochSec), zone))

  private def fmt(epoch: Long): String =
    java.time.Instant.ofEpochSecond(epoch).atZone(java.time.ZoneId.of(zone))
      .toLocalDate.toString

  /** Local date string of "now" (analyzed_date / scraped_date). */
  def todayStr: String = fmt(nowEpoch)

  /** Local date-time string of "now" (analysis_date header — the
    * reference formats `datetime.now()` as `%Y-%m-%d %H:%M:%S`,
    * analyze_insta_enhanced.py:2009). */
  def nowStr: String =
    java.time.Instant.ofEpochSecond(nowEpoch).atZone(java.time.ZoneId.of(zone))
      .toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Local date string of the cutoff (hashtag_analysis_date_range). */
  def cutoffStr(days: Int): String = fmt(cutoff(days))
}

object IgClock {
  /** Clock matching the reference's golden run: analyzed.json was produced
    * 2025-09-07 04:26:50 in Asia/Kathmandu (+05:45) — inferred by matching
    * posting-hour histograms and the per-creator 90-day post counts. */
  val golden: IgClock = IgClock(
    nowEpoch = java.time.ZonedDateTime.of(2025, 9, 7, 4, 26, 50, 0,
      java.time.ZoneId.of("Asia/Kathmandu")).toEpochSecond,
    zone = "Asia/Kathmandu")
}
