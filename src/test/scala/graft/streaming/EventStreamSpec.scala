package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Timestamp.valueOf("2024-01-01 00:05:00"), "click", 1.0),
    (Timestamp.valueOf("2024-01-01 00:45:00"), "click", 2.0),
    (Timestamp.valueOf("2024-01-01 01:05:00"), "click", 4.0),
    (Timestamp.valueOf("2024-01-01 00:30:00"), "view", 8.0))

  test("hourlyByType in streaming mode (watermark) matches batch mode") {
    val batch = EventStream.hourlyByType(
      rows.toDF("ts", "event_type", "value"))
      .orderBy("hour_ts", "event_type").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStream.hourlyByType(
      mem.toDF().toDF("ts", "event_type", "value"), watermark = Some("2 hours"))
    val q = stream.writeStream
      .format("memory").queryName("hourly_test").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_test")
        .orderBy("hour_ts", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
      // sanity on content: hour 0 clicks = 2 events, value 3.0
      val h0 = streamed.head
      assert(h0.getAs[Long]("n_events") == 2L)
      assert(h0.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("ohlcDaily streams to the exact bars TimeSeries.ohlcBars computes " +
       "in batch (struct-min/max folds associatively across micro-batches)") {
    // out-of-order within the day: open must be the 09:00 event, close
    // the 18:00 one, whatever order they arrive in
    val evRows = Seq(
      (Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "click", 5.0),
      (Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "click", 7.0),
      (Timestamp.valueOf("2024-01-01 18:00:00"), 3L, "click", 2.0),
      (Timestamp.valueOf("2024-01-02 10:00:00"), 4L, "click", 9.0),
      (Timestamp.valueOf("2024-01-01 11:00:00"), 5L, "view", 1.0))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("day").cast("string"), col("open"),
        col("close"), col("high"), col("low"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .sorted.toSeq

    val batch = canon(graft.etl.TimeSeries.ohlcBars(
      evRows.toDF("ts", "event_id", "event_type", "value")))
    assert(batch.contains(("click", "2024-01-01", 7.0, 2.0, 7.0, 2.0, 3L)),
      s"batch bars wrong: $batch")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.ohlcDaily(
        mem.toDF().toDF("ts", "event_id", "event_type", "value"),
        watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("ohlc_test")
      .outputMode("complete").start()
    try {
      // two micro-batches split MID-DAY: the state store must fold the
      // partial bars associatively
      mem.addData(evRows.take(2): _*)
      q.processAllAvailable()
      mem.addData(evRows.drop(2): _*)
      q.processAllAvailable()
      assert(canon(spark.table("ohlc_test")) == batch,
        "streamed bars diverge from batch")
    } finally q.stop()
  }

  test("slidingByType in streaming mode matches batch and lands 4 windows per event") {
    val batch = EventStream.slidingByType(
      rows.toDF("ts", "event_type", "value"))
      .orderBy("win_start", "event_type").collect()
    // each event lands in exactly length/slide = 4 windows
    assert(batch.map(_.getAs[Long]("n_events")).sum == 4L * rows.size)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStream.slidingByType(
      mem.toDF().toDF("ts", "event_type", "value"), watermark = Some("2 hours"))
    val q = stream.writeStream
      .format("memory").queryName("sliding_test").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .orderBy("win_start", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("native session_window agrees with the LAG sessionizer on real events") {
    val ev = graft.core.Tables(spark, sf(), "events")
    val native = EventStream.sessionWindows(ev)
      .select(col("user_id"), unix_micros(col("session_start")).as("us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val lag = graft.operators.Sessionize.sessions(ev)
      .orderBy("user_id", "start_us").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSeq
    assert(native == lag)
  }

  test("session_window runs as a stream and matches its own batch result") {
    val batch = EventStream.sessionWindows(
      rows.map { case (ts, t, v) => (ts, 1L, t, v) }
        .toDF("ts", "user_id", "event_type", "value"))
      .orderBy("user_id", "session_start").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.sessionWindows(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"),
      watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("sw_test")
      .outputMode("complete").start()
    try {
      mem.addData(rows.map { case (ts, t, v) => (ts, 1L, t, v) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("sw_test")
        .orderBy("user_id", "session_start").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("append mode finalizes windows past the watermark and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.hourlyByType(mem.toDF().toDF("ts", "event_type", "value"),
      watermark = Some("30 minutes"))
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // hour-0 events, then an hour-2 event advances the watermark to
      // 01:30 — hour 0 is finalized and emitted
      mem.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:45:00"), "click", 2.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 02:10:00"), "click", 4.0))
      q.processAllAvailable()
      // a straggler for hour 0, now behind the watermark: dropped
      mem.addData((Timestamp.valueOf("2024-01-01 00:50:00"), "click", 64.0))
      q.processAllAvailable()
      val rows = spark.table("wm_test").collect()
        .map(r => r.getAs[Timestamp]("hour_ts") -> r.getAs[Double]("total_value"))
        .toMap
      assert(rows(Timestamp.valueOf("2024-01-01 00:00:00")) == 3.0,
        "hour-0 window should be finalized WITHOUT the late straggler")
    } finally q.stop()
  }

  test("streamed HLL registers merge to the exact one-pass batch estimate") {
    // users deliberately spread across hours with overlap: merging
    // per-hour registers must dedup across windows exactly
    val evRows = (0 until 60).map { i =>
      (Timestamp.valueOf(s"2024-01-01 0${i % 3}:0${i % 6}:00"),
        (i % 17).toLong, i.toLong, "click", i * 1.5)
    }
    val df = evRows.toDF("ts", "user_id", "event_id", "event_type", "value")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val q = EventStream.hourlyUserSketch(
      mem.toDF().toDF("ts", "user_id", "event_id", "event_type", "value"),
      watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("sketch_test")
      .outputMode("complete").start()
    try {
      mem.addData(evRows: _*)
      q.processAllAvailable()
      val registers = spark.table("sketch_test")
      // per-window registers == batch registers of the same rows
      val batchRegs = EventStream.hourlyUserSketch(df)
        .orderBy("hour_ts", "event_type", "bucket").collect()
      assert(registers.orderBy("hour_ts", "event_type", "bucket").collect()
        .toSeq == batchRegs.toSeq)
      // merged across ALL windows == the one-pass batch sketch of
      // events_approx_stats (bit-identical, not approximately)
      val merged = EventStream.sketchEstimate(registers, Seq("event_type"))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Double]("approx_users")).toMap
      val onePass = graft.operators.Sessionize.approxStats(df)
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Double]("approx_users")).toMap
      assert(merged == onePass)
      // and the estimate is actually close: 17 distinct users
      assert(math.abs(merged("click") - 17.0) / 17.0 <= 0.10)
    } finally q.stop()
  }

  test("stream-static tier join matches batch, unknown users bucketed") {
    val evRows = Seq(
      (Timestamp.valueOf("2024-01-01 00:05:00"), 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 00:45:00"), 2L, 2.0),
      (Timestamp.valueOf("2024-01-01 00:50:00"), 99L, 4.0)) // not in dim
    val userDim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")

    val batch = EventStream.hourlyByUserTier(
      evRows.toDF("ts", "user_id", "value"), userDim)
      .orderBy("hour_ts", "tier").collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStream.hourlyByUserTier(
      mem.toDF().toDF("ts", "user_id", "value"), userDim,
      watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("tier_test")
      .outputMode("complete").start()
    try {
      mem.addData(evRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tier_test")
        .orderBy("hour_ts", "tier").collect()
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.map(_.getAs[String]("tier")).toSet ==
        Set("gold", "basic", "unknown"))
    } finally q.stop()
  }
}
