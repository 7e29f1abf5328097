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

  test("funnel only counts stages in signup→click→purchase order") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "signup", t(1)), (2L, 10L, "click", t(2)),
      (3L, 10L, "purchase", t(3)),
      // user 2: click BEFORE signup, purchase after a later click — the
      // pre-signup click must not qualify, the post-signup one does
      (4L, 20L, "click", t(1)), (5L, 20L, "signup", t(2)),
      (6L, 20L, "click", t(4)), (7L, 20L, "purchase", t(5)),
      // user 3: purchase before any click — never converts
      (8L, 30L, "signup", t(1)), (9L, 30L, "purchase", t(2)),
      // user 4: no signup at all
      (10L, 40L, "click", t(1)), (11L, 40L, "purchase", t(2)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(1.0))
    val r = Sessionize.funnel(ev).head()
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_signup") == 3L)         // users 1, 2, 3
    assert(r.getAs[Long]("n_click_after_signup") == 2L)   // users 1, 2
    assert(r.getAs[Long]("n_purchase_after_click") == 2L) // users 1, 2
  }

  test("retention cohorts by first day and counts day-k actives") {
    import java.sql.Timestamp
    def d(day: Int, h: Int = 1) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val ev = Seq(
      (1L, 10L, d(1)), (2L, 10L, d(1, 5)), (3L, 10L, d(3)), // cohort 1/1, active k=0,2
      (4L, 20L, d(1)), (5L, 20L, d(2)),                     // cohort 1/1, k=0,1
      (6L, 30L, d(2)))                                      // cohort 1/2, k=0
      .toDF("event_id", "user_id", "ts")
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
    val got = Sessionize.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("sampled-bounds winsorize (the 100 TB default) tracks the exact form") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val byType = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = byType(Sessionize.winsorize(ev, exact = true))
    val approx = byType(Sessionize.winsorize(ev))
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (t, a) =>
      val n = exact(t).getAs[Long]("n_events")
      assert(a.getAs[Long]("n_events") == n, s"row coverage changed for $t")
      // Order-statistic bound: a q-quantile estimated from k samples
      // sits within ~3·sqrt(q(1-q)/k) + 2/k quantile positions of the
      // truth, so each sampled cut clips at most that much more of the
      // stream than the exact 1%. The bottom-k sketch keeps
      // min(n, QsK) rows per type — never zero for a non-empty type.
      val k = math.min(n.toDouble, graft.operators.Sketches.QsK.toDouble)
      val clipBound = 0.01 + 3 * math.sqrt(0.01 * 0.99 / k) + 2 / k
      Seq("n_clipped_lo", "n_clipped_hi").foreach { c =>
        assert(a.getAs[Long](c) <= clipBound * n,
          s"$c over-clips for $t: ${a.getAs[Long](c)} of $n (bound $clipBound)")
      }
      // Clipping only moves tail mass to a nearby cut, so the totals
      // track within a few percent even where the cuts differ.
      val et = exact(t).getAs[Double]("winsorized_total")
      val at = a.getAs[Double]("winsorized_total")
      assert(math.abs(at - et) / math.abs(et) <= 0.05,
        s"winsorized_total off >5% for $t: $at vs $et")
    }
  }

  test("types with ≤ k rows are EXACT under the sketch basis: default == " +
       "exact (the old fixed-fraction sample could miss a tiny type " +
       "entirely; the bottom-k sketch keeps every row)") {
    val ev = Seq(
      (101L, 1L, "tiny", 10.0), (102L, 1L, "tiny", 20.0),
      (103L, 1L, "tiny", 90.0),
      (201L, 2L, "mid", 1.0), (202L, 2L, "mid", 2.0),
      (203L, 2L, "mid", 3.0), (204L, 2L, "mid", 4.0))
      .map { case (id, u, t, v) =>
        (id, u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(Sessionize.winsorize(ev).collect().toSeq ==
      Sessionize.winsorize(ev, exact = true).collect().toSeq,
      "small-group winsorize diverged from exact")
    assert(Sessionize.medianByType(ev).collect().toSeq ==
      Sessionize.medianByType(ev, exact = true).collect().toSeq,
      "small-group median diverged from exact")
  }

  test("sampled medianByType (the 100 TB default) is rank-stable vs exact") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val exactIqr = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val approx = Sessionize.medianByType(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(approx.keySet == exactIqr.keySet && approx.nonEmpty)
    approx.foreach { case (t, a) =>
      // n_events counts the FULL stream (the sample feeds only the median)
      assert(a.getAs[Long]("n_events") == exactIqr(t).getAs[Long]("n"))
      val m = a.getAs[Double]("median_value")
      assert(m >= exactIqr(t).getAs[Double]("p25") &&
        m <= exactIqr(t).getAs[Double]("p75"),
        s"sampled median outside exact IQR for $t")
    }
  }
}
