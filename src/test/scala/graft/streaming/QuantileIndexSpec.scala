package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[QuantileIndex]] — the quantile sketch's streaming deployment:
  * per-batch bottom-k partitions whose merge-on-read equals the
  * one-pass sketch of everything ever streamed.
  */
class QuantileIndexSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64
  private def mkIndex(root: String) = new QuantileIndex(spark,
    s"$root/qidx",
    template = Seq.empty[(Long, String, Double)]
      .toDF("event_id", "event_type", "value"),
    group = Seq("event_type"), value = col("value"), rowId = col("event_id"),
    k = k)

  private def rows(n: Range, t: String) =
    n.map(i => (i.toLong, t, (i * 37 % 101).toDouble))

  test("streamed per-batch sketches merge to the one-pass sketch " +
       "row-for-row; replay is a no-op; compact's DISTINCT fold is " +
       "exactly bottom-k idempotence") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_qidx").toString
    val idx = mkIndex(root)
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("event_id", "event_type", "value")
      .writeStream.foreachBatch(idx.maintain).start()
    val b1 = rows(1 to 400, "a") ++ rows(401 to 500, "b")
    val b2 = rows(501 to 900, "a") ++ rows(901 to 1200, "b")
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def sk(df: DataFrame) =
      df.orderBy("event_type", "__qh", "__qid").collect().toSeq
    val onePass = Sketches.quantileSketch(
      (b1 ++ b2).toDF("event_id", "event_type", "value"),
      Seq("event_type"), col("value"), col("event_id"), k)
    assert(sk(idx.sketch) == sk(onePass),
      "merged streamed sketch diverged from one-pass")

    // at-least-once replay: the same batch id re-lands — no change
    idx.accept(b2.toDF("event_id", "event_type", "value"), 1L)
    assert(sk(idx.sketch) == sk(onePass), "replay changed the sketch")

    // compaction folds every batch partition through union+DISTINCT —
    // for bottom-k that's idempotence, not data loss
    idx.compact(lastCommittedBatchId = 1L)
    assert(sk(idx.sketch) == sk(onePass), "compaction changed the sketch")

    // estimates ride the standing sketch
    val est = idx.estimate(Seq("p50" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val direct = Sketches.quantileEstimate(onePass, Seq("event_type"),
      Seq("p50" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    assert(est == direct)
  }
}
