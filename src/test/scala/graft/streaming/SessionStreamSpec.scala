package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (40-min gap between events 2 and 3);
  // user 2: one session
  private val rows = Seq(
    (1L, 101L, ts("2024-01-01 00:00:00"), 1.0),
    (1L, 102L, ts("2024-01-01 00:10:00"), 2.0),
    (1L, 103L, ts("2024-01-01 00:50:00"), 4.0),
    (2L, 201L, ts("2024-01-01 00:05:00"), 8.0))

  test("gap-closed sessions are emitted incrementally; timeout closes idle ones") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = SessionStream.sessions(
      mem.toDF().toDF("user_id", "event_id", "ts", "value"),
      gapMinutes = 30, watermark = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("sessions_test").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // user 1 session 1 closes on the in-stream gap; with a 0-second
      // watermark delay the watermark reaches 00:50 immediately, so the
      // no-data batch also fires user 2's 00:35 timeout. User 1's
      // session 2 (timeout 01:20) stays open.
      val afterGap = spark.table("sessions_test")
        .orderBy("user_id", "session_seq").collect()
      assert(afterGap.length == 2)
      assert(afterGap.head.getAs[Long]("user_id") == 1L)
      assert(afterGap.head.getAs[Long]("n_events") == 2L)
      assert(afterGap.head.getAs[Double]("total_value") == 3.0)
      assert(afterGap.head.getAs[Long]("duration_us") == 10L * 60 * 1000000)
      assert(afterGap(1).getAs[Long]("user_id") == 2L)

      // advance the watermark far past user 1's last event -> its open
      // session 2 closes by event-time timeout
      mem.addData((3L, 301L, ts("2024-01-01 06:00:00"), 0.5))
      q.processAllAvailable()
      val closed = spark.table("sessions_test")
        .orderBy("user_id", "session_seq").collect()
      assert(closed.length == 3)
      val u1s2 = closed(1)
      assert(u1s2.getAs[Long]("user_id") == 1L
        && u1s2.getAs[Long]("session_seq") == 2L
        && u1s2.getAs[Long]("n_events") == 1L
        && u1s2.getAs[Double]("total_value") == 4.0)
      val u2s1 = closed(2)
      assert(u2s1.getAs[Long]("user_id") == 2L
        && u2s1.getAs[Long]("n_events") == 1L
        && u2s1.getAs[Double]("total_value") == 8.0)
    } finally q.stop()
  }

  test("session metrics agree with the batch Sessionize operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = SessionStream.sessions(
      mem.toDF().toDF("user_id", "event_id", "ts", "value"),
      gapMinutes = 30, watermark = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("sessions_batch_parity").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      // sentinel far in the future closes everything
      mem.addData((99L, 999L, ts("2024-02-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_batch_parity")
        .selectExpr("user_id", "session_seq", "n_events", "start_us",
          "end_us", "total_value", "duration_us")
        .orderBy("user_id", "session_seq").collect()
      val batch = graft.operators.Sessionize.sessions(
          rows.toDF("user_id", "event_id", "ts", "value"), gapMinutes = 30)
        .selectExpr("user_id", "session_seq", "n_events", "start_us",
          "end_us", "total_value", "duration_us")
        .orderBy("user_id", "session_seq").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
