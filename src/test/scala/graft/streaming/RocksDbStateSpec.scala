package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The stateful operators run on the default (HDFS-backed in-memory)
  * state store in their own specs; at 100 TB the standard deployment
  * is RocksDB (state spills to local disk instead of executor heap, so
  * per-partition state is not heap-bounded). The operators never touch
  * the store API directly — this spec proves that store-agnosticism by
  * re-running a stateful sessionization (flatMapGroupsWithState) and a
  * stream-stream interval join with
  * `spark.sql.streaming.stateStore.providerClass` set to RocksDB and
  * asserting the same results the default-store specs pin.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("flatMapGroupsWithState sessionization is identical on the RocksDB store") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, Timestamp, Double)]
      val out = SessionStream.sessions(
        mem.toDF().toDF("user_id", "event_id", "ts", "value"),
        gapMinutes = 30, watermark = "0 seconds")
      val q = out.writeStream
        .format("memory").queryName("rocksdb_sessions").outputMode("append").start()
      try {
        mem.addData(
          (1L, 101L, ts("2024-01-01 00:00:00"), 1.0),
          (1L, 102L, ts("2024-01-01 00:10:00"), 2.0),
          (1L, 103L, ts("2024-01-01 00:50:00"), 4.0),
          (2L, 201L, ts("2024-01-01 00:05:00"), 8.0))
        mem.addData((99L, 999L, ts("2024-02-01 00:00:00"), 0.0)) // closes all
        q.processAllAvailable()
        // the query must actually have run on RocksDB
        assert(q.lastProgress.stateOperators.asScala_safe
          .exists(_.customMetrics.containsKey("rocksdbGetCount")),
          s"no RocksDB metrics in ${q.lastProgress.json}")
        val got = spark.table("rocksdb_sessions")
          .selectExpr("user_id", "session_seq", "n_events", "total_value")
          .orderBy("user_id", "session_seq").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSeq
        // same sessions the default-store SessionStreamSpec pins (the
        // sentinel user's own session stays open — nothing advances
        // the watermark past its timeout)
        assert(got == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0),
          (2L, 1L, 1L, 8.0)))
      } finally q.stop()
    }
  }

  test("stream-stream interval join is identical on the RocksDB store") {
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 00:20:00"), 1.0),
      (2L, 10L, ts("2024-01-01 01:00:00"), 2.0),
      (3L, 20L, ts("2024-01-01 00:40:00"), 3.0))
    val purchases = Seq(
      (100L, 10L, ts("2024-01-01 00:05:00"), 50.0),
      (101L, 10L, ts("2024-01-01 00:50:00"), 60.0),
      (102L, 20L, ts("2024-01-01 02:00:00"), 70.0))
    val batch = JoinStream.clicksWithRecentPurchase(
      clicks.toDF("event_id", "user_id", "ts", "value"),
      purchases.toDF("event_id", "user_id", "ts", "value"))
      .orderBy("event_id", "p_ts").collect().toSeq
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val cm = MemoryStream[(Long, Long, Timestamp, Double)]
      val pm = MemoryStream[(Long, Long, Timestamp, Double)]
      val joined = JoinStream.clicksWithRecentPurchase(
        cm.toDF().toDF("event_id", "user_id", "ts", "value"),
        pm.toDF().toDF("event_id", "user_id", "ts", "value"),
        watermark = Some("10 minutes"))
      val q = joined.writeStream.format("memory").queryName("rocksdb_ssj")
        .outputMode("append").start()
      try {
        cm.addData(clicks: _*)
        pm.addData(purchases: _*)
        q.processAllAvailable()
        val got = spark.table("rocksdb_ssj")
          .orderBy("event_id", "p_ts").collect().toSeq
        assert(got == batch && got.nonEmpty)
      } finally q.stop()
    }
  }

  /** Tiny shim: stateOperators is a Java array in the progress JSON
    * API; wrap without pulling in extra converters.
    */
  private implicit class ArrOps[T](private val a: Array[T]) {
    def asScala_safe: Seq[T] = a.toSeq
  }
}
