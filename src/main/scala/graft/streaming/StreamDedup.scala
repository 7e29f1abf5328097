package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the live twin of
  * [[graft.operators.Dedup.exact]] for a continuously-ingested corpus
  * (the shape of a training-data intake pipeline: keep the first copy
  * of each document, drop re-crawls).
  *
  * State discipline at scale: a plain `dropDuplicates` on a stream
  * retains every key forever — unbounded state. Using
  * `dropDuplicatesWithinWatermark` instead lets the state store evict a
  * hash once the watermark passes its event time, so state size is
  * O(distinct keys per watermark horizon), independent of stream
  * length. Duplicates arriving within the horizon (the overwhelmingly
  * common re-crawl window) are still caught exactly.
  */
object StreamDedup {

  /** First arrival per content hash. `docs` needs (ts: timestamp,
    * doc_id: long, text: string); works on batch frames too (no
    * watermark → plain dropDuplicates for backfill parity).
    */
  def firstArrivals(docs: DataFrame, watermark: Option[String] = None): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col("text")))
    watermark match {
      case Some(w) =>
        hashed.withWatermark("ts", w)
          .dropDuplicatesWithinWatermark("content_hash")
      case None =>
        hashed.dropDuplicates("content_hash")
    }
  }
}
