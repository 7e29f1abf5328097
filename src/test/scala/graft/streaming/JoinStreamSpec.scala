package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  //                 event_id, user,  ts,                     value
  private val clicks = Seq(
    (1L, 10L, Timestamp.valueOf("2024-01-01 00:20:00"), 1.0),
    (2L, 10L, Timestamp.valueOf("2024-01-01 01:00:00"), 2.0),
    (3L, 20L, Timestamp.valueOf("2024-01-01 00:40:00"), 3.0))
  private val purchases = Seq(
    (100L, 10L, Timestamp.valueOf("2024-01-01 00:05:00"), 50.0), // within 30m of click 1
    (101L, 10L, Timestamp.valueOf("2024-01-01 00:50:00"), 60.0), // within 30m of click 2
    (102L, 20L, Timestamp.valueOf("2024-01-01 02:00:00"), 70.0)) // AFTER click 3 — no match

  private def cdf(rows: Seq[(Long, Long, Timestamp, Double)]) =
    rows.toDF("event_id", "user_id", "ts", "value")

  test("streaming inner interval join matches the batch twin") {
    val batch = JoinStream.clicksWithRecentPurchase(
      cdf(clicks), cdf(purchases)).orderBy("event_id", "p_ts").collect()

    implicit val sqlCtx = spark.sqlContext
    val cm = MemoryStream[(Long, Long, Timestamp, Double)]
    val pm = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = JoinStream.clicksWithRecentPurchase(
      cm.toDF().toDF("event_id", "user_id", "ts", "value"),
      pm.toDF().toDF("event_id", "user_id", "ts", "value"),
      watermark = Some("10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      cm.addData(clicks: _*)
      pm.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_inner").orderBy("event_id", "p_ts").collect()
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("left-outer emits unmatched clicks with nulls once the watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val cm = MemoryStream[(Long, Long, Timestamp, Double)]
    val pm = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = JoinStream.clicksWithRecentPurchase(
      cm.toDF().toDF("event_id", "user_id", "ts", "value"),
      pm.toDF().toDF("event_id", "user_id", "ts", "value"),
      watermark = Some("10 minutes"), joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      cm.addData(clicks: _*)
      pm.addData(purchases: _*)
      q.processAllAvailable()
      // advance BOTH watermarks far past every click so unmatched rows
      // can no longer gain a partner and must be emitted with nulls
      // (distinct users so the advancers don't match each other)
      cm.addData((99L, 30L, Timestamp.valueOf("2024-01-01 06:00:00"), 0.0))
      pm.addData((999L, 31L, Timestamp.valueOf("2024-01-01 06:00:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("ssj_outer").collect()
      val unmatched = out.filter(r => r.isNullAt(r.fieldIndex("p_ts")))
        .map(_.getAs[Long]("event_id"))
      assert(unmatched.contains(3L),
        s"click 3 (purchase came too late) should emit null-matched: ${out.toSeq}")
      val matched = out.filter(r => !r.isNullAt(r.fieldIndex("p_ts")))
        .map(_.getAs[Long]("event_id")).toSet
      assert(matched == Set(1L, 2L))
    } finally q.stop()
  }
}
