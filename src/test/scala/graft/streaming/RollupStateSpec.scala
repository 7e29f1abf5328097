package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[RollupState]] — deployed incremental-aggregate maintenance:
  * per-batch deltas folded into a standing rollup under the
  * idempotent per-batch-id contract (the
  * [[graft.etl.Incremental.mergedMonthlyOrders]] semantics, wired to
  * `foreachBatch` like the ohlcDaily precedent).
  */
class RollupStateSpec extends SparkSpec {
  import spark.implicits._

  // event rollup: (day, event_type) -> n_events, cents
  private def deltaOf(batch: DataFrame): DataFrame =
    batch.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))

  private def ev(id: Long, day: String, t: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(s"$day 10:00:00"), t, v)

  private def rollupOf(rows: Seq[(Long, java.sql.Timestamp, String, Double)]) =
    deltaOf(rows.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("day", "event_type")

  private def mkState(root: String) = new RollupState(spark, s"$root/state",
    template = deltaOf(Seq.empty[(Long, java.sql.Timestamp, String, Double)]
      .toDF("event_id", "ts", "event_type", "value")),
    groupCols = Seq("day", "event_type"), sumCols = Seq("n_events", "cents"))

  test("streamed per-batch deltas merge to the one-pass rollup across " +
       ">= 2 batches; a replayed batch converges; compact preserves sums") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_rollup").toString
    val state = mkState(root)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = mem.toDF().toDF("event_id", "ts", "event_type", "value")
      .writeStream.foreachBatch(state.maintain(deltaOf)).start()
    val b1 = Seq(ev(1, "2024-01-01", "view", 1.25), ev(2, "2024-01-01", "view", 2.0),
      ev(3, "2024-01-01", "click", 0.5))
    val b2 = Seq(ev(4, "2024-01-01", "view", 4.0), // same group as batch 1!
      ev(5, "2024-01-02", "view", 8.0))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def rows(df: DataFrame) = df.orderBy("day", "event_type").collect().toSeq
    val expect = rows(rollupOf(b1 ++ b2))
    assert(rows(state.current) == expect,
      "merged deltas diverged from one-pass recompute")

    // at-least-once replay: batch 1's delta re-lands under its own id —
    // the sum must not double-count
    state.accept(deltaOf(b2.toDF("event_id", "ts", "event_type", "value")), 1L)
    assert(rows(state.current) == expect, "replay double-counted a delta")

    // compact folds all deltas; identical-valued cross-batch rows must
    // survive the distinct fold (src_batch keeps them distinct)
    state.compact(lastCommittedBatchId = 1L)
    assert(rows(state.current) == expect, "compaction changed the rollup")
  }

  test("identical deltas in different batches both count (the src_batch " +
       "guard on the distinct compaction fold)") {
    val root = Files.createTempDirectory("graft_rollup2").toString
    val state = mkState(root)
    val sameRows = Seq(ev(1, "2024-01-01", "view", 1.0))
    val sameDelta = deltaOf(sameRows.toDF("event_id", "ts", "event_type", "value"))
    state.accept(sameDelta, 0L)
    state.accept(sameDelta, 1L) // a DIFFERENT batch, same delta values
    def total() = state.current.agg(sum("n_events")).head().getLong(0)
    assert(total() == 2L, "equal deltas from different batches collapsed")
    state.compact(lastCommittedBatchId = 1L)
    assert(total() == 2L,
      "compaction's distinct fold collapsed equal cross-batch deltas")
  }
}
