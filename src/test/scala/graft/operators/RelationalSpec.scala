package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join and range join semantics on hand-built inputs. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward matches latest right row at-or-before left time") {
    // user 1: purchases at t=10 (id 100, v=1.0) and t=20 (id 101, v=2.0)
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 50L))
      .toDF("event_id", "user_id", "us")
    val right = Seq((100L, 1L, 10L, 1.0), (101L, 1L, 20L, 2.0))
      .toDF("event_id", "user_id", "us", "value")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "us", "us",
      Seq("value"), "event_id", "p_").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("p_us")).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).isEmpty)        // before any purchase
    assert(out(2L).contains(10L))  // equal timestamp matches (<=)
    assert(out(3L).contains(20L))  // latest prior
    assert(out(4L).isEmpty)        // other user has no purchases
  }

  test("asof backward breaks right-side time ties by largest tiebreak") {
    val left = Seq((1L, 7L, 10L)).toDF("event_id", "user_id", "us")
    val right = Seq((100L, 7L, 10L, 1.0), (200L, 7L, 10L, 2.0))
      .toDF("event_id", "user_id", "us", "value")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "us", "us",
      Seq("value"), "event_id", "p_").collect()
    assert(out.head.getAs[Double]("p_value") == 2.0) // event_id 200 wins
  }

  test("asof forward matches earliest right row at-or-after left time") {
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 50L))
      .toDF("event_id", "user_id", "us")
    val right = Seq((100L, 1L, 10L, 1.0), (101L, 1L, 20L, 2.0))
      .toDF("event_id", "user_id", "us", "value")
    val out = AsOfJoin.forward(left, right, Seq("user_id"), "us", "us",
      Seq("value"), "event_id", "p_").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("p_us")).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(10L))  // next purchase ahead
    assert(out(2L).contains(10L))  // equal timestamp matches (>=)
    assert(out(3L).isEmpty)        // nothing after t=25
    assert(out(4L).isEmpty)        // other user has no purchases
  }

  test("asof forward breaks right-side time ties by SMALLEST tiebreak") {
    val left = Seq((1L, 7L, 10L)).toDF("event_id", "user_id", "us")
    val right = Seq((200L, 7L, 10L, 2.0), (100L, 7L, 10L, 1.0))
      .toDF("event_id", "user_id", "us", "value")
    val out = AsOfJoin.forward(left, right, Seq("user_id"), "us", "us",
      Seq("value"), "event_id", "p_").collect()
    assert(out.head.getAs[Double]("p_value") == 1.0) // event_id 100 wins
  }

  test("bucketed range join equals the naive BETWEEN join, incl. overlaps") {
    val facts = Seq(0.0, 4.9, 5.0, 7.0, 12.0, 49.9).toDF("v")
    val ranges = Seq((0L, 0.0, 7.0), (1L, 5.0, 12.0), (2L, 40.0, 60.0))
      .toDF("tier", "lo", "hi")
    val got = RangeJoin.pointInRange(facts, "v", ranges, "lo", "hi", 5.0)
      .select("v", "tier").as[(Double, Long)].collect().toSet
    val want = facts.as[Double].collect().flatMap { v =>
      Seq((0L, 0.0, 7.0), (1L, 5.0, 12.0), (2L, 40.0, 60.0))
        .filter(r => v >= r._2 && v <= r._3).map(r => (v, r._1))
    }.toSet
    assert(got == want)
    assert(got.contains((5.0, 0L)) && got.contains((5.0, 1L))) // overlap hit
  }

  test("range join plan is a broadcast hash join, not nested-loop") {
    val facts = Seq(1.0, 2.0).toDF("v")
    val ranges = Seq((0L, 0.0, 7.0)).toDF("tier", "lo", "hi")
    val plan = RangeJoin.pointInRange(facts, "v", ranges, "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
