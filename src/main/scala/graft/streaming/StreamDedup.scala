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

  /** One micro-batch of ingest-time NEAR-dup scrubbing — the streaming
    * deployment of [[graft.operators.Dedup.minhashIncremental]]: keep
    * only batch rows (full rows, all columns) that near-duplicate
    * neither `corpus` nor a lower-id batch doc.
    *
    * Near-dup needs the corpus-side LSH index, which no streaming
    * state store holds, so the live shape is `foreachBatch` with
    * `corpus = static index ∪ sink-so-far` — each accepted batch
    * grows the probed corpus, which is what makes CROSS-batch
    * near-dups (doc in batch 2 resembling a doc accepted in batch 1)
    * get caught; StreamDedupSpec pins that and sequential-batch
    * parity. Per-batch work stays batch-proportional: the corpus is
    * probed through its (band, bucket) postings, never re-deduped.
    */
  def scrubNearDups(batch: DataFrame, corpus: DataFrame, n: Int = 3,
                    numHashes: Int = 32, bands: Int = 8,
                    minJaccard: Double = 0.5): DataFrame =
    batch.join(
      graft.operators.Dedup.minhashIncremental(
        batch, corpus, n, numHashes, bands, minJaccard),
      Seq("doc_id"), "left_semi")
}
