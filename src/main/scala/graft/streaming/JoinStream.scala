package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join, written against the unified Dataset API
  * so the SAME code runs as a batch join (backfill) and as a
  * streaming-streaming join (live).
  *
  * Scale shape: the equi-key (`user_id`) shards both streams' join
  * state across executors, and the interval condition + watermark bound
  * that state in TIME — a click can only match purchases at most
  * `lookback` older, so once the watermark passes `ts - lookback` the
  * buffered purchase rows are expired from the state store. Without the
  * time bound, stream-stream join state grows forever; with it, state
  * is O(events per lookback window), independent of stream length.
  */
object JoinStream {

  /** Each click enriched with same-user purchases from the `lookback`
    * interval before it (inner → only matched; leftOuter → unmatched
    * clicks emit with nulls once the watermark proves no match can
    * still arrive).
    */
  def clicksWithRecentPurchase(clicks: DataFrame, purchases: DataFrame,
                               watermark: Option[String] = None,
                               lookback: String = "30 minutes",
                               joinType: String = "inner"): DataFrame = {
    val c = watermark.fold(clicks)(clicks.withWatermark("ts", _))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val pw = watermark.fold(p)(p.withWatermark("p_ts", _))
    c.join(pw,
      col("user_id") === col("p_user") &&
        col("p_ts") <= col("ts") &&
        col("p_ts") >= col("ts") - expr(s"INTERVAL $lookback"),
      joinType)
      .drop("p_user")
  }
}
