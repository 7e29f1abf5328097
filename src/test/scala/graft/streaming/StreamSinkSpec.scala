package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming write path: foreachBatch with per-batch-id overwrite —
  * the idempotent sink pattern for exactly-once parquet output (a
  * replayed micro-batch overwrites its own directory instead of
  * appending duplicates).
  */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch parquet sink is idempotent per batch id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "value").writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
        ()
      }
      .start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 4.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/batch=*")
      assert(out.count() == 3)
      assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
      // simulate a replay of batch 0: overwriting its directory with
      // the same rows leaves totals unchanged (append would duplicate)
      val b0 = spark.read.parquet(s"$dir/batch=0").collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(b0),
        spark.read.parquet(s"$dir/batch=0").schema)
        .write.mode("overwrite").parquet(s"$dir/batch=0")
      assert(spark.read.parquet(s"$dir/batch=*").count() == 3)
    } finally q.stop()
  }
}
