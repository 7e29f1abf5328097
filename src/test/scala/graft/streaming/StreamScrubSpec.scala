package graft.streaming

import graft.SparkSpec
import graft.operators.Redact
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** PII scrubbing is an INGEST-time transform — at 100 TB you scrub the
  * stream once on the way in, not the lake afterwards. [[Redact]] is
  * a pure stateless expression chain, so the same column expressions
  * must run unmodified inside a streaming query with batch-identical
  * results (no watermark, no state store — row-local redaction).
  */
class StreamScrubSpec extends SparkSpec {
  import spark.implicits._

  test("streaming scrub output is row-identical to the batch scrub") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "mail alice@example.com from 10.0.0.7"),
      (2L, "call +1 (415) 555-0137 re 2024-01-01"),
      (3L, "clean row, nothing to redact"))
    val mem = MemoryStream[(Long, String)]
    val scrubbed = Redact.scrub(mem.toDF().toDF("doc_id", "text"))
    val q = scrubbed.writeStream.format("memory")
      .queryName("scrub_sink").outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("scrub_sink")
        .orderBy("doc_id").collect().toSeq
      val batch = Redact.scrub(rows.toDF("doc_id", "text"))
        .orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
      assert(batch.map(_.getAs[String]("text")) == Seq(
        s"mail ${Redact.EmailTok} from ${Redact.IpTok}",
        s"call ${Redact.PhoneTok} re 2024-01-01",
        "clean row, nothing to redact"))
    } finally q.stop()
  }
}
