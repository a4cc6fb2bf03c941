package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential test for the as-of join composition: the windowed
  * union formulation must equal a brute-force per-left-row lookup
  * (greatest right time <= left time, max payload on time ties) on
  * arbitrary generated data — including equal timestamps, keys with no
  * right rows, and multiple right rows per (key, time). */
object AsOfJoinSpec extends Properties("asof-join") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = graft.Sessions.local("4", "graft-asof-test")
  import spark.implicits._

  /** The same composition as Relational.asOfJoinEventsOrders, over
    * in-memory frames (the operator shape under test). */
  private def asOf(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val ev = left.toDF("event_id", "k", "t")
    val ord = right.toDF("o_id", "k", "t")
      .groupBy("k", "t").agg(max("o_id").as("o_id"))
    val tagged = ev.select(col("k"), col("t"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("o_id"))
      .unionByName(ord.select(col("k"), col("t"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), col("o_id")))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("m", last(col("o_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "m")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
  }

  /** Brute force oracle. */
  private def reference(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      val candidates = right.filter(r => r._2 == k && r._3 <= t)
      id -> (if (candidates.isEmpty) None else {
        val best = candidates.map(_._3).max
        Some(candidates.filter(_._3 == best).map(_._1).max)
      })
    }.toMap

  private val rowGen = for {
    k <- Gen.choose(0L, 3L)
    t <- Gen.choose(0L, 12L)
  } yield (k, t)

  /** The NATIVE whole-operator path (AsOfJoinPlan → AsOfJoinStrategy →
    * AsOfJoinExec merge pass) over the same in-memory frames. */
  private def asOfNative(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    import org.apache.spark.sql.GraftColumnBridge.{expression, logicalPlan, ofRows}
    val ev = left.toDF("event_id", "k", "t")
    val ord = right.toDF("o_id", "rk", "rt")
      .groupBy("rk", "rt").agg(max("o_id").as("o_id"))
    val joined = ofRows(spark, graft.plans.AsOfJoinPlan(
      logicalPlan(ev), logicalPlan(ord),
      expression(ev("k")), expression(ev("t")),
      expression(ord("rk")), expression(ord("rt"))))
    assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "native as-of node missing from the physical plan")
    joined.select("event_id", "o_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
  }

  property("native AsOfJoinExec equals the brute-force as-of lookup") =
    Prop.forAll(
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, rowGen))) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
      val have = asOfNative(left, right)
      val want = reference(left, right)
      val ok = have == want
      if (!ok) println(s"NATIVE ASOF MISMATCH left=$left right=$right\n want=$want\n have=$have")
      ok
    }

  private val nullableRowGen = for {
    k <- Gen.frequency(3 -> Gen.choose(0L, 3L).map(Some(_)), 1 -> Gen.const(None))
    t <- Gen.frequency(3 -> Gen.choose(0L, 12L).map(Some(_)), 1 -> Gen.const(None))
  } yield (k, t)

  /** Native path over NULLABLE key/time columns (ADVICE round 4: NULLs
    * must be no-match, not silently key/time 0). */
  private def asOfNativeOpt(left: Seq[(Long, Option[Long], Option[Long])],
                            right: Seq[(Long, Option[Long], Option[Long])]) = {
    import org.apache.spark.sql.GraftColumnBridge.{expression, logicalPlan, ofRows}
    val ev = left.toDF("event_id", "k", "t")
    val ord = right.toDF("o_id", "rk", "rt")
      .groupBy("rk", "rt").agg(max("o_id").as("o_id"))
    val joined = ofRows(spark, graft.plans.AsOfJoinPlan(
      logicalPlan(ev), logicalPlan(ord),
      expression(ev("k")), expression(ev("t")),
      expression(ord("rk")), expression(ord("rt"))))
    joined.select("event_id", "o_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
  }

  property("native AsOfJoinExec treats NULL keys/times as no-match") =
    Prop.forAll(
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, nullableRowGen)),
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, nullableRowGen))) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
      val have = asOfNativeOpt(left, right)
      val want = left.map { case (id, ko, to) =>
        id -> (for {
          lk <- ko; lt <- to
          best <- {
            val cs = right.collect {
              case (oid, Some(rk), Some(rt)) if rk == lk && rt <= lt => (oid, rt)
            }
            if (cs.isEmpty) None
            else { val bt = cs.map(_._2).max; Some(cs.filter(_._2 == bt).map(_._1).max) }
          }
        } yield best)
      }.toMap
      val ok = have == want
      if (!ok) println(s"NULL ASOF MISMATCH left=$left right=$right\n want=$want\n have=$have")
      ok
    }

  property("windowed union equals the brute-force as-of lookup") =
    Prop.forAll(
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, rowGen)),
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, rowGen))) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
      val have = asOf(left, right)
      val want = reference(left, right)
      val ok = have == want
      if (!ok) println(s"ASOF MISMATCH left=$left right=$right\n want=$want\n have=$have")
      ok
    }
}
