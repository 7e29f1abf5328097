package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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

  /** One micro-batch of ingest-time NEAR-dup scrubbing against a raw
    * TEXT corpus — the convenience twin of [[scrubNearDupsIndexed]]
    * that derives the corpus LSH index inline. Keep only batch rows
    * (full rows, all columns) that near-duplicate neither `corpus` nor
    * a lower-id batch doc.
    *
    * Fine for a one-shot backfill or a small static corpus; it
    * re-scans corpus text on every call, so the deployment shape for
    * a GROWING corpus is [[NearDupIndex]]: persist the
    * (postings, shingles) index once, probe it per batch via
    * [[scrubNearDupsIndexed]], append each accepted batch's index rows
    * — per-batch work stays proportional to the batch and its bucket
    * collisions, never the corpus.
    */
  def scrubNearDups(batch: DataFrame, corpus: DataFrame, n: Int = 3,
                    numHashes: Int = 32, bands: Int = 8,
                    minJaccard: Double = 0.5): DataFrame =
    batch.join(
      Dedup.minhashIncremental(
        batch, corpus, n, numHashes, bands, minJaccard),
      Seq("doc_id"), "left_semi")

  /** [[scrubNearDups]] against a PERSISTED corpus index: the batch is
    * probed through stored (doc_id, band, bucket) postings and
    * (doc_id, sh) shingle frames ([[graft.operators.Dedup.minhashProbe]]),
    * so the plan never reads a corpus text column — the only text
    * scanned is the batch's own. This is the per-micro-batch kernel
    * that [[NearDupIndex.accept]] wraps with index maintenance.
    */
  def scrubNearDupsIndexed(batch: DataFrame, corpusPostings: DataFrame,
                           corpusShingles: DataFrame, n: Int = 3,
                           numHashes: Int = 32, bands: Int = 8,
                           minJaccard: Double = 0.5): DataFrame =
    batch.join(
      Dedup.minhashProbe(
        batch, corpusPostings, corpusShingles, n, numHashes, bands, minJaccard),
      Seq("doc_id"), "left_semi")

  /** Warehouse-path existence via the Hadoop filesystem of the path's
    * scheme — a `java.io.File` check would silently report false for
    * every hdfs:// or s3:// index dir and re-bootstrap it empty.
    */
  private[streaming] def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The empty (doc_id, text) frame the index bootstraps derive their
    * real schemas from.
    */
  private[streaming] def emptyDocs(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))

  /** The partition value index seeds ([[NearDupIndex.append]] /
    * [[SpanIndex.append]]) write under — below any real foreachBatch
    * batch id, so seed rows are never excluded by a probe's
    * own-batch filter.
    */
  final val SeedBatchId = -1L

  /** The shared own-batch replay-exclusion filter — one definition so
    * the two indexes cannot silently diverge in replay behavior.
    */
  private[streaming] def exceptBatch(df: DataFrame, batchId: Long): DataFrame =
    df.filter(col("batch") =!= lit(batchId))

  /** Bootstrap one index frame if (and only if) it is missing — each
    * frame independently, so a crash between two frames' bootstraps
    * leaves the done one alone and the re-run fills only the gap;
    * overwriting BOTH on "either missing" would wipe the seed rows of
    * a frame that still holds real data.
    */
  private[streaming] def bootstrapFrame(spark: SparkSession, dirPath: String,
                                        empty: => DataFrame): Unit =
    if (!pathExists(spark, dirPath))
      empty.write.mode("overwrite").parquet(s"$dirPath/batch=$SeedBatchId")

  /** Offline index maintenance shared by [[NearDupIndex.compact]] and
    * [[SpanIndex.compact]]: fold every `batch=<id>` partition of one
    * frame into the seed partition. Crash-safe by ordering — the
    * folded superset lands in `batch=-1` (idempotent overwrite) BEFORE
    * any old partition is deleted, so a failure at any point leaves a
    * frame whose content is a superset of the original (duplicate rows
    * are harmless to the semi-join probes) and a re-run converges.
    *
    * PRECONDITION: the stream is STOPPED and its checkpoint has
    * committed past every folded batch. A batch replayed after its
    * rows were folded into the seed partition would no longer be
    * excluded by the own-batch filter — the exact self-match the
    * per-batch layout exists to prevent.
    */
  private[streaming] def compactFrame(spark: SparkSession, dirPath: String): Unit = {
    val all = spark.read.parquet(dirPath).drop("batch").distinct()
      .localCheckpoint() // materialize BEFORE rewriting the dirs being read
    all.write.mode("overwrite").parquet(s"$dirPath/batch=$SeedBatchId")
    val root = new org.apache.hadoop.fs.Path(dirPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("batch=") &&
        s.getPath.getName != s"batch=$SeedBatchId")
      .foreach(s => fs.delete(s.getPath, true))
  }
}

/** A persisted, incrementally-maintained MinHash-LSH corpus index for
  * ingest-time near-dup scrubbing — the `foreachBatch` deployment of
  * [[graft.operators.Dedup.minhashProbe]].
  *
  * Layout: two parquet frames under `dir` — `postings/` (doc_id, band,
  * bucket) and `shingles/` (doc_id, sh), exactly the frames
  * [[graft.operators.Dedup.bandedBuckets]] and
  * [[graft.operators.Dedup.shingleTable]] emit — each partitioned by
  * the writing micro-batch's id (`batch=<id>/`). Both are created
  * empty (with the real schemas, derived from the same builders over
  * an empty corpus) at construction, so the per-batch probe plan is
  * identical from batch 0 onward; the bootstrap re-runs if EITHER
  * frame is missing and overwrites both, so a crash between the two
  * writes cannot leave the index half-initialized.
  *
  * Replay safety: `foreachBatch` delivers at-least-once, so a batch
  * can re-run after its index rows landed but before the checkpoint
  * committed. [[accept]] therefore (a) probes the index EXCLUDING the
  * current batch id's partitions — a replayed batch never matches its
  * own prior attempt's rows — and (b) OVERWRITES its own `batch=<id>`
  * partitions rather than appending, so the re-run converges to the
  * same index state (the same discipline as
  * [[StreamSink.idempotentParquet]]). StreamDedupSpec replays a batch
  * and asserts identical output and index.
  *
  * Scale shape: each [[accept]] reads the index frames (columnar,
  * pruned columns, own-batch partitions pruned at the source), probes
  * them with batch-derived buckets, and writes only the ACCEPTED
  * batch's index rows. Corpus text is never stored in the index and
  * never re-scanned — work per micro-batch is O(batch + bucket
  * collisions) even as the indexed corpus grows to 100 TB, versus the
  * O(corpus) re-derivation of the inline
  * [[StreamDedup.scrubNearDups]] path. StreamDedupSpec pins both
  * properties (cross-batch drops; no text column in any file scan of
  * the probe plan).
  */
class NearDupIndex(spark: SparkSession, dir: String, n: Int = 3,
                   numHashes: Int = 32, bands: Int = 8,
                   minJaccard: Double = 0.5) {
  private val postingsDir = s"$dir/postings"
  private val shinglesDir = s"$dir/shingles"

  locally {
    StreamDedup.bootstrapFrame(spark, postingsDir,
      Dedup.bandedBuckets(StreamDedup.emptyDocs(spark), n, numHashes, bands))
    StreamDedup.bootstrapFrame(spark, shinglesDir,
      Dedup.shingleTable(StreamDedup.emptyDocs(spark), n))
  }

  def postings: DataFrame = spark.read.parquet(postingsDir)
  def shingles: DataFrame = spark.read.parquet(shinglesDir)

  /** Index `docs` (doc_id, text, ...) without scrubbing — the one-time
    * backfill that seeds the index from an existing static corpus.
    * (The corpus text is read ONCE, here; never again at probe time.)
    */
  def append(docs: DataFrame): Unit = {
    Dedup.bandedBuckets(docs, n, numHashes, bands).write.mode("append")
      .parquet(s"$postingsDir/batch=${StreamDedup.SeedBatchId}")
    Dedup.shingleTable(docs, n).write.mode("append")
      .parquet(s"$shinglesDir/batch=${StreamDedup.SeedBatchId}")
  }

  /** Scrub one micro-batch against the index and grow it: returns the
    * accepted rows (all batch columns) and overwrites the batch's own
    * index partitions, so the NEXT batch's probe sees them —
    * cross-batch near-dups drop — while a REPLAY of this batch id
    * neither matches its own prior rows nor duplicates them.
    *
    * The accepted frame is localCheckpoint'd (materialized) BEFORE the
    * write: its plan reads the very parquet dirs being written, and a
    * lazy plan re-evaluated afterwards would see the batch's own
    * postings and drop everything as a self-match.
    */
  def accept(batch: DataFrame, batchId: Long): DataFrame = {
    val kept = StreamDedup.scrubNearDupsIndexed(
      batch, StreamDedup.exceptBatch(postings, batchId),
      StreamDedup.exceptBatch(shingles, batchId),
      n, numHashes, bands, minJaccard)
      .localCheckpoint()
    val keptDocs = kept.select(col("doc_id"), col("text"))
    Dedup.bandedBuckets(keptDocs, n, numHashes, bands).write.mode("overwrite")
      .parquet(s"$postingsDir/batch=$batchId")
    Dedup.shingleTable(keptDocs, n).write.mode("overwrite")
      .parquet(s"$shinglesDir/batch=$batchId")
    kept
  }

  /** Fold all batch partitions of both frames into their seed
    * partitions — see [[StreamDedup.compactFrame]] for the crash-safety
    * argument and the stopped-stream precondition.
    */
  def compact(): Unit = {
    StreamDedup.compactFrame(spark, postingsDir)
    StreamDedup.compactFrame(spark, shinglesDir)
  }
}

/** A persisted, incrementally-maintained gram-hash index for
  * ingest-time SPAN dedup — the `foreachBatch` deployment of
  * [[graft.operators.Dedup.duplicateSpansProbe]], and the span-grain
  * sibling of [[NearDupIndex]].
  *
  * Layout: one parquet frame under `dir/grams` holding the distinct
  * 64-bit gram hashes ever accepted — 8 bytes per distinct gram, no
  * positions, no text — partitioned by the writing micro-batch's id.
  * Each [[scrub]] probes the frame with batch-derived hashes (work ∝
  * batch + matches, never corpus), excises the duplicated spans from
  * the batch's documents, and writes the batch's own distinct gram
  * hashes so later batches dedupe against everything seen — including
  * re-crawls of passages that were themselves excised. Writes
  * accumulate per-batch distinct sets (not globally distinct):
  * semi-join correctness is unaffected, and [[compact]] folds the
  * partitions (between runs) when file counts grow — do NOT run a
  * generic directory compaction like Maintenance.compact here, it
  * would flatten the batch partitioning the replay contract needs.
  *
  * Replay safety mirrors [[NearDupIndex]]: the probe excludes the
  * current batch id's partition (a replayed batch never sees its own
  * prior grams — which would otherwise mark EVERY position duplicated
  * and gut the batch) and the write overwrites that partition.
  */
class SpanIndex(spark: SparkSession, dir: String, k: Int = 8) {
  private val gramsDir = s"$dir/grams"

  locally {
    StreamDedup.bootstrapFrame(spark, gramsDir,
      Dedup.gramTable(StreamDedup.emptyDocs(spark), k))
  }

  def grams: DataFrame = spark.read.parquet(gramsDir)

  /** Index `docs` (doc_id, text, ...) without scrubbing — the one-time
    * seed from an existing static corpus.
    */
  def append(docs: DataFrame): Unit =
    Dedup.gramTable(docs, k).write.mode("append")
      .parquet(s"$gramsDir/batch=${StreamDedup.SeedBatchId}")

  /** This batch's duplicate spans vs the index ∪ the batch itself,
    * excluding any prior attempt of the same batch id.
    */
  def spans(batch: DataFrame, batchId: Long): DataFrame =
    Dedup.duplicateSpansProbe(
      batch, StreamDedup.exceptBatch(grams, batchId), k)

  /** Scrub one micro-batch: returns the batch with every span already
    * seen (or shared within the batch) excised — all non-text batch
    * columns preserved, `clean_text` and `n_removed` attached — and
    * grows the index with the batch's grams (own-partition overwrite;
    * see the class doc's replay contract). localCheckpoint'd before
    * the write for the same read-write reason as
    * [[NearDupIndex.accept]].
    */
  def scrub(batch: DataFrame, batchId: Long): DataFrame = {
    val cleaned = batch.drop("text")
      .join(Dedup.exciseWith(batch, spans(batch, batchId)), Seq("doc_id"))
      .localCheckpoint()
    Dedup.gramTable(batch, k).write.mode("overwrite")
      .parquet(s"$gramsDir/batch=$batchId")
    cleaned
  }

  /** Fold all batch partitions into the seed partition — see
    * [[StreamDedup.compactFrame]] for the crash-safety argument and
    * the stopped-stream precondition.
    */
  def compact(): Unit = StreamDedup.compactFrame(spark, gramsDir)
}
