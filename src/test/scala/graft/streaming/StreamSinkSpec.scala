package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** Streaming write path: [[StreamSink.idempotentParquet]] (foreachBatch
  * with per-batch-id overwrite — exactly-once parquet output under
  * replay) and [[StreamSink.ingestAvailableNow]] (checkpointed
  * incremental file ingest).
  */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch parquet sink is idempotent per batch id") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "value").writeStream
      .foreachBatch(StreamSink.idempotentParquet(dir))
      .start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 4.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/batch=*")
      assert(out.count() == 3)
      assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
      // simulate a replay of batch 0: re-delivering the same rows to the
      // sink writer leaves totals unchanged (append would duplicate)
      val b0 = spark.read.parquet(s"$dir/batch=0")
      StreamSink.idempotentParquet(dir)(
        spark.createDataFrame(
          spark.sparkContext.parallelize(b0.collect().toSeq), b0.schema),
        0L)
      assert(spark.read.parquet(s"$dir/batch=*").count() == 3)
    } finally q.stop()
  }

  test("file-source incremental ingest processes each drop exactly once (AvailableNow)") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_ingest_incr").toString
    val (in, out, ckpt) = (s"$root/landing", s"$root/mart", s"$root/ckpt")

    def drop(ids: Range): Unit = ids.map(i => (i.toLong, i * 1.5))
      .toDF("id", "value").write.mode("append").parquet(in)
    def runOnce(): Unit = StreamSink.ingestAvailableNow(
      spark, in, StructType.fromDDL("id LONG, value DOUBLE"), out, ckpt,
      _.withColumn("doubled", col("value") * 2))

    drop(1 to 5)
    runOnce()
    assert(spark.read.parquet(out).count() == 5)
    drop(6 to 8)
    runOnce()
    val rows = spark.read.parquet(out)
    // 8 rows total: the second run ingested ONLY the new drop (the
    // checkpoint remembers processed files), the first 5 not re-read
    assert(rows.count() == 8)
    assert(rows.select("id").as[Long].collect().toSet == (1L to 8L).toSet)
    // the transform applied on the stream path
    assert(rows.filter(col("doubled") =!= col("value") * 2).count() == 0)
    // re-running with nothing new is a no-op
    runOnce()
    assert(spark.read.parquet(out).count() == 8)
  }
}
