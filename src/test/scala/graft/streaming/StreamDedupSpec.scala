package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup keeps first arrival per content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamDedup.firstArrivals(
      mem.toDF().toDF("ts", "doc_id", "text"), watermark = Some("1 hour"))
    val q = out.writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate of doc 1
      mem.addData(
        (ts("2024-01-01 00:00:00"), 1L, "alpha"),
        (ts("2024-01-01 00:01:00"), 2L, "beta"),
        (ts("2024-01-01 00:02:00"), 3L, "alpha"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate (state catches it) + a new doc
      mem.addData(
        (ts("2024-01-01 00:10:00"), 4L, "beta"),
        (ts("2024-01-01 00:11:00"), 5L, "gamma"))
      q.processAllAvailable()

      val got = spark.table("dedup_test")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")),
        s"expected first arrivals only, got $got")
    } finally q.stop()
  }

  test("batch mode matches the batch dedup operator's clusters") {
    val docs = Seq(
      (ts("2024-01-01 00:00:00"), 1L, "alpha"),
      (ts("2024-01-01 00:01:00"), 2L, "beta"),
      (ts("2024-01-01 00:02:00"), 3L, "alpha"))
      .toDF("ts", "doc_id", "text")
    val kept = StreamDedup.firstArrivals(docs)
      .select("content_hash").as[String].collect().toSet
    val clusters = graft.operators.Dedup.exact(docs)
      .select("content_hash").as[String].collect().toSet
    assert(kept == clusters)
  }
}
