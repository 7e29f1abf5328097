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
}
