package graft.streaming

import graft.SparkSpec
import graft.operators.QualityModel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Ingest-time model scoring: [[QualityModel.scoreExpr]] freezes the
  * trained weights into a stateless per-row expression, so quality
  * classification runs inside a streaming query with no join, no
  * aggregation and no state — the `Redact.scrub` deployment shape,
  * for a learned gate.
  */
class StreamScoreSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = Seq(
    (1L, "insightful analysis of the experiment results", 1.0),
    (2L, "careful reasoning about the method and evidence", 1.0),
    (3L, "buy cheap pills now click here", 0.0),
    (4L, "winner click now for free money", 0.0))
    .toDF("doc_id", "text", "label")

  test("scoreExpr in a stream == classifyStreaming in batch, and agrees " +
    "with the relational scorer after round(4)") {
    implicit val sqlCtx = spark.sqlContext
    val (model, _) = QualityModel.train(labeled, iters = 20)

    val incoming = Seq(
      (10L, "careful analysis of the evidence"),
      (11L, "click now buy cheap"),
      (12L, ""))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), QualityModel.scoreExpr(model).as("p"))
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("scored_stream")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = QualityModel.classifyStreaming(
      incoming.toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("p")).toMap
    assert(streamed === batch) // identical expression → identical rows

    // parity with the relational (join+aggregate) scorer after the
    // repo-wide 4-decimal round (summation order differs in the ulp)
    val relational = QualityModel.classify(incoming.toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("p")).toMap
    incoming.map(_._1).foreach { id =>
      assert(math.abs(streamed(id) - relational(id)) < 1e-9,
        s"doc $id: stream ${streamed(id)} vs relational ${relational(id)}")
    }
    // the learned gate still separates
    assert(streamed(10L) > 0.5 && streamed(11L) < 0.5)
  }

  test("streaming scorer plan is a pure projection: no join, no aggregate") {
    val (model, _) = QualityModel.train(labeled, iters = 2)
    val df = QualityModel.classifyStreaming(
      Seq((1L, "some text")).toDF("doc_id", "text"), model)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"stateless scorer must not join:\n$plan")
    assert(!plan.contains("Aggregate"), s"must not aggregate:\n$plan")
  }
}
