package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split on >30min gaps per user") {
    // user 7: events at t=0m, 10m, 50m (gap 40m → new session), 60m
    val base = 1700000000000000L // epoch micros
    val m = 60L * 1000000L
    val ev = Seq(
      (1L, base, 7L, 1.0), (2L, base + 10 * m, 7L, 2.0),
      (3L, base + 50 * m, 7L, 4.0), (4L, base + 60 * m, 7L, 8.0),
      (5L, base, 9L, 1.5))
      .toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("value"))
    val out = Sessionize.sessions(ev).collect()
    val u7 = out.filter(_.getAs[Long]("user_id") == 7L)
    assert(u7.map(r => (r.getAs[Long]("session_seq"),
      r.getAs[Long]("n_events"))).toSeq == Seq((1L, 2L), (2L, 2L)))
    assert(u7.head.getAs[Double]("total_value") == 3.0)
    assert(u7.head.getAs[Long]("duration_us") == 10 * m)
    assert(out.count(_.getAs[Long]("user_id") == 9L) == 1)
  }

  test("topUsers is a deterministic leaderboard") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val out = Sessionize.topUsers(ev, 5).collect()
    assert(out.length == 5)
    val totals = out.map(_.getAs[Double]("total_value")).toSeq
    assert(totals == totals.sorted.reverse)
  }

  test("approxStats sketches stay within error bounds of exact answers") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val approx = Sessionize.approxStats(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("users"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (t, a) =>
      val users = exact(t).getAs[Long]("users").toDouble
      // 10%: with n ≈ 15 users in m = 512 registers a single birthday
      // collision moves the linear-counting estimate by ~1/n ≈ 6.7%.
      assert(math.abs(a.getAs[Double]("approx_users") - users) / users <= 0.10,
        s"HLL distinct off >10% for $t: ${a.getAs[Double]("approx_users")} vs $users")
      assert(a.getAs[Long]("n_sample") > 0, s"empty quantile sample for $t")
      // Sampled median must be rank-stable: within the exact IQR.
      val p50s = a.getAs[Double]("p50_value")
      assert(p50s >= exact(t).getAs[Double]("p25") &&
        p50s <= exact(t).getAs[Double]("p75"),
        s"sampled p50 outside exact IQR for $t")
      assert(p50s <= a.getAs[Double]("p95_value"))
      assert(a.getAs[Double]("p95_value") <= a.getAs[Double]("p99_value"))
    }
  }

  test("valueDeciles matches SQL ntile semantics when k does not divide n") {
    // 13 users, k=10: SQL ntile front-loads the remainder — bucket
    // sizes [2,2,2,1,1,1,1,1,1,1], NOT an even spread
    val base = 1700000000000000L
    val ev = (1L to 13L).map(u => (u, base, u, u * 10.0))
      .toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("value"))
    val out = Sessionize.valueDeciles(ev).collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("n_users"))
    assert(out.toSeq == ((1L to 3L).map(_ -> 2L) ++ (4L to 10L).map(_ -> 1L)))
  }

  test("daily HLL sketches merge to the exact same estimate as one pass") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val daily = Sessionize.dailyUserSketches(ev)
    assert(daily.count() > 1, "need multiple days for the merge to matter")
    val merged = Sessionize.mergedUserEstimate(daily)
      .head().getAs[Long]("approx_distinct_users")
    // register-merge is associative: merged daily sketches == the
    // sketch built in one pass over everything
    val onePass = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .head().getAs[Long]("e")
    assert(merged == onePass, s"merge changed the sketch: $merged vs $onePass")
    val exact = ev.select(countDistinct("user_id")).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= 0.05, s"estimate off: $merged vs $exact")
  }
}
