package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import java.sql.Timestamp

/** The transformWithState twins must be drop-in: identical outputs to
  * their flatMapGroupsWithState / dropDuplicatesWithinWatermark
  * siblings on the same input stream. transformWithState requires the
  * RocksDB provider, so both sides of each parity run use it (store
  * choice is already proven result-invisible by RocksDbStateSpec).
  */
class TwsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (40-min gap); user 2: one session; the
  // sentinel's huge timestamp advances the watermark so event-time
  // timers / timeouts fire for every idle session
  private val sessionRows = Seq(
    (1L, 101L, ts("2024-01-01 00:00:00"), 1.0),
    (1L, 102L, ts("2024-01-01 00:10:00"), 2.0),
    (1L, 103L, ts("2024-01-01 00:50:00"), 4.0),
    (2L, 201L, ts("2024-01-01 00:05:00"), 8.0))
  private val sentinel = (99L, 999L, ts("2024-02-01 00:00:00"), 0.0)

  private def runSessions(name: String)(
      f: DataFrame => Dataset[SessionStream.SessionOut]): Seq[SessionStream.SessionOut] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = f(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(sessionRows: _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
      spark.table(name).as[SessionStream.SessionOut]
        .collect().sortBy(s => (s.user_id, s.session_seq)).toSeq
    } finally q.stop()
  }

  test("transformWithState sessionization emits exactly the fMGWS sessions " +
       "(gap close in-batch, timer close on watermark)") {
    withRocksDb {
      val tws = runSessions("tws_sessions")(
        TwsStream.sessions(_, gapMinutes = 30, watermark = "0 seconds"))
      val fmgws = runSessions("fmgws_sessions")(
        SessionStream.sessions(_, gapMinutes = 30, watermark = "0 seconds"))
      assert(tws == fmgws, s"API twins diverged:\n  tws=$tws\n  fm=$fmgws")
      // and the timer really closed the idle sessions: u1 s2 and u2 s1
      // only complete once the sentinel advances the watermark
      assert(tws.map(s => (s.user_id, s.session_seq, s.n_events, s.total_value))
        == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
    }
  }

  private val firstB1 = Seq((ts("2024-01-01 00:00:00"), 1L, "alpha doc"),
    (ts("2024-01-01 00:01:00"), 2L, "beta doc"))
  private val firstB2 = Seq((ts("2024-01-01 00:05:00"), 3L, "alpha doc"), // re-crawl
    (ts("2024-01-01 00:06:00"), 4L, "gamma doc"))

  test("transformWithState first-arrival dedup drops cross-batch re-crawls " +
       "exactly like the dropDuplicatesWithinWatermark twin") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      def drive(name: String)(f: DataFrame => DataFrame): Set[Long] = {
        val mem = MemoryStream[(Timestamp, Long, String)]
        val q = f(mem.toDF().toDF("ts", "doc_id", "text"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          mem.addData(firstB1: _*); q.processAllAvailable()
          mem.addData(firstB2: _*); q.processAllAvailable()
          spark.table(name).select("doc_id").as[Long].collect().toSet
        } finally q.stop()
      }

      val tws = drive("tws_first")(df => TwsStream.firstArrivals(df).toDF())
      val wm = drive("wm_first")(df =>
        StreamDedup.firstArrivals(df, watermark = Some("1 hour")))
      assert(tws == Set(1L, 2L, 4L), s"tws kept $tws")
      assert(tws == wm, s"API twins diverged: tws=$tws wm=$wm")
    }
  }

  test("TTL'd first-arrival dedup holds state across checkpoint restarts " +
       "(ProcessingTime mode spins, so the driver polls instead of " +
       "processAllAvailable)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_tws_ttl").toString
      val mem = MemoryStream[(Timestamp, Long, String)]
      val ttl = org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofHours(1))

      val outDir = java.nio.file.Files
        .createTempDirectory("graft_tws_ttl_out").toString

      // ProcessingTime mode (which a TTL requires) reports work on
      // every trigger — a TTL could lapse at any moment — so neither
      // processAllAvailable nor Trigger.AvailableNow ever terminates;
      // poll the sink for the expected survivors instead. The memory
      // sink refuses checkpoint recovery, so the restart leg needs a
      // durable (file) sink.
      def runUntil(expect: Set[Long]): Unit = {
        val q = TwsStream
          .firstArrivals(mem.toDF().toDF("ts", "doc_id", "text"), ttl)
          .toDF().writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        try {
          def kept() =
            try spark.read.parquet(outDir).select("doc_id")
              .as[Long].collect().toSet
            catch { case _: Throwable => Set.empty[Long] }
          val deadline = System.currentTimeMillis + 90000
          while (kept() != expect && System.currentTimeMillis < deadline)
            Thread.sleep(100)
          assert(kept() == expect, s"TTL'd dedup kept ${kept()}")
        } finally q.stop()
      }

      mem.addData(firstB1: _*)
      runUntil(Set(1L, 2L))
      mem.addData(firstB2: _*)
      // state survived the restart: alpha's re-crawl (doc 3) still drops
      runUntil(Set(1L, 2L, 4L))
    }
  }
}
