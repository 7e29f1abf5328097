package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus — the lookup half of the
  * curation toolbox (find the training docs that mention X; audit what
  * a benchmark's keywords hit; spot-check a dedup cluster).
  *
  * Scoring is a log-free BM11-style tf·idf kept fully in integer
  * arithmetic so the ranking is engine-exact (the [[TextAnalysis.tfidfTop]]
  * doctrine): `score = Σ_terms tf · (n_docs·S div df)` with S = 10^6 and
  * `div` integral division — every intermediate is a BIGINT, identical
  * in any engine, no float summation whose addition order could differ
  * across partitions. The idf step value `n_docs·S` must stay under
  * 2^63 / max tf; S is a parameter so a trillion-doc corpus shrinks it
  * (or moves the sum to DECIMAL(38,0), which [[keywordSearch]] already
  * does internally — only the final score is cast back to BIGINT).
  */
object Retrieval {

  /** Top-k documents per keyword query.
    *
    * Scale shape: the query set is literal and tiny — its terms become
    * an `isin` pushdown on the exploded token stream, so the (doc,term)
    * tf aggregate only ever sees QUERY terms (corpus vocabulary size is
    * irrelevant); df re-aggregates that term-sized table and broadcasts
    * back; the per-query rank window is partitioned by query_id with
    * WindowGroupLimit, so the final exchange carries ≤k rows per query.
    * One corpus scan, one (doc,term) shuffle, everything after is
    * query-sized.
    *
    * @param queries (query_id, terms) — terms are matched as exact
    *                whitespace tokens (the corpus tokenization).
    */
  def keywordSearch(docs: DataFrame, queries: Seq[(Int, Seq[String])],
                    k: Int = 10, scale: Long = 1000000L): DataFrame = {
    val qTerms = queries.flatMap(_._2).distinct
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokensScriptAware(col("text"))).as("term"))
      .filter(col("term").isin(qTerms.map(lit(_)): _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    searchCore(tf, docs.agg(count(lit(1)).as("n_docs")), queries, k, scale)
  }

  /** Build-once inverted index: the corpus tokenized ONCE into
    * (doc_id, term, tf) postings — persist this and every subsequent
    * query set runs against it via [[keywordSearchIndexed]] without
    * ever rescanning corpus text (the build-once/query-many split the
    * dedup indexes make for ingest, applied to retrieval). Postings
    * are term-grain aggregated (map-side combined), ~tens of bytes a
    * row vs the documents they summarize.
    */
  def postingsTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokensScriptAware(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** [[keywordSearch]] against a prebuilt [[postingsTable]]: the term
    * `isin` prunes the postings scan (pushed to parquet when the table
    * is persisted), so per-query-set work is the matched postings —
    * corpus text never moves. `nDocs` is the corpus size the idf needs
    * (record it when building the index). Shares [[searchCore]] with
    * the inline form, so the two can never drift on scoring
    * (spec-pinned identical results).
    */
  def keywordSearchIndexed(postings: DataFrame, nDocs: Long,
                           queries: Seq[(Int, Seq[String])],
                           k: Int = 10, scale: Long = 1000000L): DataFrame = {
    val qTerms = queries.flatMap(_._2).distinct
    val tf = postings.filter(col("term").isin(qTerms.map(lit(_)): _*))
    searchCore(tf,
      postings.sparkSession.range(1).select(lit(nDocs).as("n_docs")),
      queries, k, scale)
  }

  /** POSITIONAL postings: (doc_id, term, pos) instance rows — the
    * phrase-query companion of [[postingsTable]] (which aggregates
    * positions away and so can only answer bags of words). Instance
    * grain is the standard positional-index cost: ~24 B a row, one
    * row per token instance (the [[Dedup.gramTable]] precedent).
    * Persist both: tf postings for ranked keyword search, positional
    * postings for phrase verification.
    */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextOps.tokensScriptAware(col("text"))))
      .toDF("doc_id", "pos", "term")
      .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"))

  /** Exact phrase search: rank documents by the number of verbatim
    * occurrences of each query phrase (consecutive tokens, in order).
    *
    * The match is ONE join + one aggregate, never a per-term
    * self-join chain: each matched posting proposes the phrase START
    * it would imply (`anchor = pos − term_idx`), and a start is a
    * real occurrence iff all `phrase_len` distinct term slots vouch
    * for the same (doc, anchor) — `COUNT(DISTINCT term_idx) =
    * phrase_len`. Repeated terms inside a phrase ("the big the") are
    * handled by the same rule: one posting row fans out once per slot
    * the term fills, and distinct-slot counting demands every slot.
    *
    * Scale shape: the phrase table is literal and broadcast; the
    * postings scan prunes to query terms (`isin`, parquet-pushed on a
    * persisted index); the anchor aggregate is map-side combinable on
    * (query, doc, anchor); the final top-k is a WindowGroupLimit
    * rank. Work ∝ matched postings, never corpus.
    */
  def phraseSearch(docs: DataFrame, phrases: Seq[(Int, Seq[String])],
                   k: Int = 10): DataFrame =
    phraseCore(positionalPostings(docs), phrases, k)

  /** [[phraseSearch]] against persisted [[positionalPostings]] —
    * corpus text never read; shares [[phraseCore]] with the inline
    * form so the two cannot drift (spec-pinned identical).
    */
  def phraseSearchIndexed(positional: DataFrame,
                          phrases: Seq[(Int, Seq[String])],
                          k: Int = 10): DataFrame =
    phraseCore(positional, phrases, k)

  private def phraseCore(positional: DataFrame,
                         phrases: Seq[(Int, Seq[String])],
                         k: Int): DataFrame = {
    val spark = positional.sparkSession
    import spark.implicits._
    require(phrases.forall(_._2.nonEmpty), "empty phrase")
    val pdf = phrases.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, t, i.toLong, ts.length.toLong) }
    }.toDF("query_id", "term", "term_idx", "phrase_len")
    val qTerms = phrases.flatMap(_._2).distinct
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_occurrences").desc, col("doc_id"))
    positional
      .filter(col("term").isin(qTerms.map(lit(_)): _*))
      .join(broadcast(pdf), "term")
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("term_idx")).as("anchor"),
        col("term_idx"), col("phrase_len"))
      // (query, doc, anchor, term_idx) is UNIQUE by construction —
      // positional postings carry one row per (doc, term, pos) and a
      // fixed (doc, anchor, term_idx) pins pos = anchor + term_idx —
      // so the slot count is a plain COUNT(*): same value as the
      // definitional COUNT(DISTINCT term_idx) the oracle writes, one
      // partial-aggregating exchange cheaper (no distinct expand)
      .groupBy("query_id", "doc_id", "anchor", "phrase_len")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("phrase_len"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("doc_id"), col("n_occurrences"))
      .orderBy("query_id", "rank")
  }

  private def searchCore(tf: DataFrame, n: DataFrame,
                         queries: Seq[(Int, Seq[String])],
                         k: Int, scale: Long): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val qdf = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qdf), "term")
      .join(broadcast(dfTable), "term")
      .crossJoin(broadcast(n))
      // contribution in DECIMAL(38,0): the per-term product is
      // BIGINT-safe by the S contract, but the SUM across terms gets
      // 128-bit headroom so a pathological doc can never wrap silently
      .withColumn("contrib",
        (col("tf") * expr(s"(n_docs * ${scale}L) div df")).cast("decimal(38,0)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").cast("long").as("score"),
        count(lit(1)).as("n_terms_matched"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("doc_id"), col("score"), col("n_terms_matched"))
      .orderBy("query_id", "rank")
  }
}
