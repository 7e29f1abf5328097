package graft.streaming

import graft.operators.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained inverted index — RETRIEVAL's
  * ingest shape, completing the pattern the dedup/embedding indexes
  * set: corpus text is tokenized exactly once, when its batch is
  * accepted; every later query set runs against the stored (doc_id,
  * term, tf) postings and never rescans a document.
  *
  * Layout: two parquet frames under `dir`, each partitioned by the
  * writing micro-batch's id — `postings/` (doc_id, term, tf — the
  * [[Retrieval.postingsTable]] grain) and `doc_counts/` (n_docs, one
  * row per batch: the idf denominator must count EVERY indexed doc,
  * including docs none of a query's terms hit, so it cannot be
  * derived from queried postings). Replay safety is own-partition
  * OVERWRITE: `foreachBatch` delivers at-least-once, and a replayed
  * batch rewrites exactly its own partitions — no exclusion join is
  * needed because indexing (unlike dedup) makes no accept/reject
  * decision a replay could flip. Compaction/retention come from
  * [[IndexMaintenance]] under the same commit-log proof as every
  * other index.
  */
class KeywordIndex(protected val spark: SparkSession, dir: String)
    extends IndexMaintenance {
  private val postingsDir = s"$dir/postings"
  private val countsDir = s"$dir/doc_counts"
  protected def frameDirs: Seq[String] = Seq(postingsDir, countsDir)

  locally {
    StreamDedup.bootstrapFrame(spark, postingsDir,
      Retrieval.postingsTable(StreamDedup.emptyDocs(spark)))
    StreamDedup.bootstrapFrame(spark, countsDir,
      spark.range(0).select(col("id").as("n_docs")))
  }

  def postings: DataFrame = spark.read.parquet(postingsDir)

  /** Total indexed documents (the idf denominator). */
  def nDocs: Long = {
    val r = spark.read.parquet(countsDir).agg(sum("n_docs")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Index one micro-batch: tokenize ONCE, land postings + the
    * batch's doc count in its own partitions (idempotent under
    * replay), pass the batch through unchanged — indexing is a
    * side-effect stage, not a filter. NULL doc_id / NULL text rows
    * are passed through un-indexed (no retrieval identity).
    */
  def accept(batch: DataFrame, batchId: Long): DataFrame = {
    val real = batch
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .localCheckpoint()
    Retrieval.postingsTable(real)
      .write.mode("overwrite").parquet(s"$postingsDir/batch=$batchId")
    real.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
    batch
  }

  /** Search the whole indexed corpus — postings frames only, text
    * never read ([[Retrieval.keywordSearchIndexed]], sharing the
    * inline form's scoring core).
    */
  def search(queries: Seq[(Int, Seq[String])], k: Int = 10,
             scale: Long = 1000000L): DataFrame =
    Retrieval.keywordSearchIndexed(postings, nDocs, queries, k, scale)
}
