package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-first event aggregation.
  *
  * [[hourlyByType]] is written against the unified Dataset API so the SAME
  * code runs as a batch query (the `events_hourly` driver query) and as a
  * streaming query over `readStream` input — the Spark-native way to keep
  * batch backfill and live pipeline semantics identical. In streaming
  * mode the watermark bounds state: windows older than `watermark` are
  * finalized and dropped from the state store, so state size is
  * O(active windows × event types), independent of stream length.
  */
object EventStream {

  /** Tumbling 1-hour aggregation per event type. Works on batch and
    * streaming DataFrames alike (pass `withWatermarkCol = true` only for
    * streaming, where late data must be bounded).
    */
  def hourlyByType(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Stream-static enrichment: events joined to a (small) static user
    * dimension, then windowed per tier.
    *
    * The static side is broadcast into every micro-batch — a
    * stream-static join keeps NO join state (unlike stream-stream), so
    * at cluster scale this is the way to attach dimension attributes to
    * a firehose: re-resolved per batch, zero state-store growth, and
    * the only streaming state is the bounded windowed aggregate. Same
    * code runs batch (backfill) and streaming (live).
    */
  def hourlyByUserTier(events: DataFrame, userDim: DataFrame,
                       watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .join(broadcast(userDim), Seq("user_id"), "left")
      .withColumn("tier", coalesce(col("tier"), lit("unknown")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("tier"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("tier"),
        col("n_events"), col("total_value"))
  }
}
