package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/element type for [[TopKByScore]]: a scored key. */
case class Scored(score: Double, key: Long)

/** Bounded top-k as a typed `Aggregator[IN, BUF, OUT]` — the "TopKByScore
  * nicety" SURVEY.md §2.9 leaves optional, here made real because it is
  * the scale-correct form of top-k-per-group.
  *
  * Why this beats the row_number window (Windows.topkOrdersPerCustomer)
  * at 100 TB: the window must shuffle EVERY fact row to its group
  * (WindowGroupLimit only trims each side to k·partitions after sorting).
  * An Aggregator participates in partial aggregation: the map-side hash
  * table already holds at most k entries per group, so the exchange
  * carries ≤ k rows per (group, mapper) instead of the whole table.
  *
  * The buffer is kept sorted (score desc, key asc — the same
  * deterministic tie-break every window in [[graft.operators.Windows]]
  * uses), so reduce is a bounded insertion and merge is a bounded
  * two-pointer merge; both are O(k).
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  /** Strict ordering: a ranks before b. */
  private def before(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], in: Scored): Array[Scored] = {
    if (buf.length >= k && !before(in, buf(buf.length - 1))) return buf
    var i = 0
    while (i < buf.length && before(buf(i), in)) i += 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Scored](n)
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = in
    if (n - i - 1 > 0) System.arraycopy(buf, i, out, i + 1, n - i - 1)
    out
  }

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] = {
    val n = math.min(a.length + b.length, k)
    val out = new Array[Scored](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      out(o) =
        if (j >= b.length || (i < a.length && before(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Scored]): Array[Scored] = buf

  override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
}

object TopKByScore {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** The shared per-group serving tail every ranked query uses: bounded
    * typed top-k per `groupCol` (map-side partial keeps ≤ k rows per
    * group·mapper) → exploded `(groupCol, rnk, key, score)` rows ordered
    * by (group, rnk). One definition so the ranking contract — score
    * desc, key asc tie-break, 1-based rnk — cannot drift between the
    * ANN, quantized-index and BM25 queries that share it; callers rename
    * `key`/`score` to their domain columns. */
  def serveTopK(df: DataFrame, groupCol: String,
                score: Column, key: Column, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k))
    df.groupBy(groupCol)
      .agg(topk(score, key).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).as("rnk"),
        col("col.key").as("key"), col("col.score").as("score"))
      .orderBy(groupCol, "rnk")
  }
}
