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

  /** Daily OHLC bars, batch or streaming — the live twin of
    * [[graft.etl.TimeSeries.ohlcBars]]. The open/close argmin/argmax
    * ride struct-min/max aggregates, which are ASSOCIATIVE — so the
    * exact same aggregate that map-side combines in batch also folds
    * incrementally across micro-batches in the streaming state store,
    * and a bar emitted at watermark close equals the batch bar over
    * the same events (spec-pinned). One (window, type) shuffle.
    */
  def ohlcDaily(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("open"), col("close"), col("high"), col("low"), col("n_events"))
  }

  /** Sliding event-time windows (1h length, 15min slide): every event
    * lands in length/slide = 4 overlapping windows. Spark expands the
    * slide inline (no self-join) and the aggregate shuffles once on
    * (window, type) with map-side partials — the moving-average shape
    * dashboards want, identical code batch or streaming.
    */
  def slidingByType(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Session aggregation via Spark's native `session_window` — the
    * merging-window state machine the engine maintains for streams
    * (vs [[graft.operators.Sessionize.sessions]]' LAG formulation,
    * which is the batch-window shape). Same gap semantics up to the
    * boundary case (session_window starts a new session at gap ==
    * `gap`, the LAG form at gap > `gap` — sets differ only on exact-
    * gap ties, measure-zero on real timestamps; cross-validated in
    * the spec). One code path for batch and streaming.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum("value") * 100, 0) / 100.0).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))
  }

  /** Streaming HLL register emission: per (1-hour window, event type,
    * register) max-rho rows from graft's deterministic HLL
    * ([[graft.functions.Hll]]).
    *
    * This is the production shape for streaming distinct-count at
    * scale: the stream job's state and its output are FIXED-SIZE
    * (≤ windows × types × 512 rows), and the emitted registers are
    * mergeable downstream — any ad-hoc slice (a day, a type, the whole
    * stream) is answered by max-merging registers and applying
    * [[sketchEstimate]], without re-touching events. Because max is
    * associative and idempotent, the merged estimate is IDENTICAL to a
    * one-pass batch sketch over the same rows (spec-asserted exactly,
    * and the batch twin is DuckDB-hash-checked via events_approx_stats).
    * Needs only one streaming aggregation, so no multi-agg restriction
    * applies; the watermark finalizes and drops old windows' registers.
    */
  def hourlyUserSketch(events: DataFrame,
                       watermark: Option[String] = None): DataFrame = {
    import graft.functions.Hll
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
        Hll.bucket(col("user_id")).as("bucket"))
      .agg(max(Hll.rho(col("user_id"))).as("mrho"))
      .select(col("w.start").as("hour_ts"), col("event_type"),
        col("bucket"), col("mrho"))
  }

  /** Merge emitted register rows over `groupCols` and estimate distinct
    * users per group — the batch read-side of [[hourlyUserSketch]].
    */
  def sketchEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    import graft.functions.Hll
    val merged = registers
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("mrho").as("mrho"))
    merged.groupBy(groupCols.map(col): _*)
      .agg(Hll.znAgg(col("mrho")).as("zn"), Hll.vEmptyAgg.as("v_empty"))
      .select(groupCols.map(col) :+
        round(Hll.estimate(col("zn"), col("v_empty")), 4).as("approx_users"): _*)
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
