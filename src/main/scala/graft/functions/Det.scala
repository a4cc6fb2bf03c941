package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (order-independent) numeric aggregation helpers.
  *
  * Double addition is not associative, so a plain `sum(double)` depends on
  * partition/merge order — fine for analytics, fatal for an exact-hash
  * oracle comparison against another engine, and a source of run-to-run
  * flakiness at cluster scale. We instead round each value to a fixed
  * decimal scale *per row* (deterministic) and sum exactly in decimal,
  * converting back to double only at the end. The per-row rounding is
  * exact for the money-like 2-decimal columns in the test schema.
  *
  * This mirrors how production engines make distributed sums reproducible
  * (decimal/integer accumulators), and keeps every aggregate expressible
  * as partial+final combine — unchanged semantics on a 1000-executor
  * cluster.
  */
object Det {
  /** Exact sum: per-row cast to DECIMAL(18, scale), exact decimal sum,
    * final cast to double. Deterministic under any aggregation order. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean via exact sum / count (double division of two
    * deterministic values). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Deterministic sample standard deviation via exact sums of x and x²:
    * sqrt((Σx² − (Σx)²/n) / (n−1)). Values are scaled to integer "cents"
    * (long) per row, so both sums are exact integers; converting the SAME
    * integer to double is identically rounded in any engine (a decimal
    * sum whose unscaled representation exceeds 2^53 is not — the
    * decimal→double conversion may double-round differently, observed
    * vs DuckDB at Σx² ≈ 9.1e15). Numerically this is the textbook
    * one-pass formula; inputs are well-conditioned (small dynamic range)
    * so cancellation is not a concern, and both engines evaluate the
    * identical expression. Requires n ≥ 2 (guard at call site).
    */
  def dstddevSamp(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10.0, scale)
    val cents  = round(c * lit(factor)).cast("long")
    val sx = sum(cents).cast("double") / lit(factor)
    val sq = sum(cents * cents).cast("double") / lit(factor * factor)
    val n  = count(c).cast("double")
    sqrt((sq - (sx * sx) / n) / (n - lit(1.0)))
  }
}
