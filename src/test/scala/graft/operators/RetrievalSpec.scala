package graft.operators

import graft.SparkSpec

/** [[Retrieval.keywordSearch]] — integer tf·idf ranking, term pushdown,
  * and the WindowGroupLimit-bounded per-query top-k.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join hash join"), // tf(hash)=3, tf(join)=3
    (2L, "hash join of tables"),
    (3L, "hash only here"),
    (4L, "join only here"),
    (5L, "nothing relevant at all"),
    (6L, "rare unique marker word")).toDF("doc_id", "text")

  test("ranks by summed tf·idf, ties to the smaller doc_id, k bounds rows") {
    val out = Retrieval.keywordSearch(docs,
      Seq(1 -> Seq("hash", "join"), 2 -> Seq("marker")), k = 3).collect()
    val q1 = out.filter(_.getAs[Long]("query_id") == 1L)
    assert(q1.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    // doc 1: both terms tf 3; docs 3 and 4 one term tf 1 each — the
    // equal scores tie-break to doc 3, and k=3 cuts doc 4
    assert(q1.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(q1.head.getAs[Long]("n_terms_matched") == 2L)
    // idf weighting: the df=1 marker term scores higher per hit than a
    // df=3 term
    val q2 = out.filter(_.getAs[Long]("query_id") == 2L)
    assert(q2.map(_.getAs[Long]("doc_id")).toSeq == Seq(6L))
    assert(q2.head.getAs[Long]("score") ==
      6L * 1000000L / 1L, "idf of a df=1 term is n_docs·S")
  }

  test("score arithmetic is exact integer: tf · (n_docs·S div df)") {
    val out = Retrieval.keywordSearch(docs, Seq(1 -> Seq("hash")), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score"))
      .toMap
    val idf = 6L * 1000000L / 3L // df(hash) = 3
    assert(out == Map(1L -> 3L * idf, 2L -> idf, 3L -> idf))
  }

  test("plan: query terms prune the token stream before the aggregate, " +
       "and the rank window gets WindowGroupLimit") {
    val plan = Retrieval.keywordSearch(docs, Seq(1 -> Seq("hash", "join")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank pushdown missing:\n$plan")
    // the isin filter must sit under the first aggregate (tf), so the
    // exchange only carries query-term rows
    assert("(?s)Filter.*term.*INSET|(?s)Filter.*term.*IN \\(".r
      .findFirstIn(plan).isDefined, s"term pushdown missing:\n$plan")
  }

  test("empty queries and no-hit terms yield empty results, not errors") {
    assert(Retrieval.keywordSearch(docs, Seq(1 -> Seq("zzz_absent"))).isEmpty)
    assert(Retrieval.keywordSearch(docs, Seq.empty).isEmpty)
  }

  test("indexed search over a persisted postings table matches the inline " +
       "form exactly and never touches corpus text") {
    val qs = Seq(1 -> Seq("hash", "join"), 2 -> Seq("vector", "scan"))
    val inline = Retrieval.keywordSearch(docs, qs).collect().toSeq

    // build once, persist, query the parquet — the deployment shape
    val dir = java.nio.file.Files.createTempDirectory("graft_kwidx").toString
    val nDocs = docs.count()
    Retrieval.postingsTable(docs).write.mode("overwrite").parquet(dir)
    val postings = spark.read.parquet(dir)
    val indexed = Retrieval.keywordSearchIndexed(postings, nDocs, qs)
    assert(indexed.collect().toSeq == inline && inline.nonEmpty,
      "indexed search diverged from the inline form")
    // the indexed plan reads the postings files only — no documents
    // table, no text column
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet") && !plan.contains("text#"),
      s"indexed search touched corpus text:\n$plan")
  }

  test("phraseSearch: counts only consecutive in-order occurrences; a " +
       "repeated-term phrase needs every distinct slot filled") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma alpha beta gamma"), // "alpha beta" ×2
      (2L, "beta alpha gamma beta"),             // reversed — 0
      (3L, "alpha alpha alpha"),                 // "alpha alpha" ×2 overlapping
      (4L, "alpha gamma beta"))                  // non-adjacent — 0
      .toDF("doc_id", "text")
    def hits(phrase: Seq[String]): Map[Long, Long] =
      Retrieval.phraseSearch(fixture, Seq(1 -> phrase))
        .select("doc_id", "n_occurrences").as[(Long, Long)].collect().toMap
    assert(hits(Seq("alpha", "beta")) == Map(1L -> 2L),
      "adjacent in-order bigram count wrong")
    assert(hits(Seq("alpha", "alpha")) == Map(3L -> 2L),
      "repeated-term phrase must demand BOTH slots at the same anchor")
    assert(hits(Seq("alpha", "beta", "gamma")) == Map(1L -> 2L))
    assert(hits(Seq("gamma", "alpha", "beta")) == Map(1L -> 1L))
  }

  test("phraseSearchIndexed over persisted positional postings matches " +
       "the inline form exactly and never touches corpus text") {
    val phrases = Seq(1 -> Seq("hash", "join"), 2 -> Seq("join", "of", "tables"))
    val inline = Retrieval.phraseSearch(docs, phrases).collect().toSeq
    assert(inline.nonEmpty, "fixture phrases hit nothing — weak test")
    val dir = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    Retrieval.positionalPostings(docs).write.mode("overwrite").parquet(dir)
    val indexed = Retrieval.phraseSearchIndexed(
      spark.read.parquet(dir), phrases)
    assert(indexed.collect().toSeq == inline,
      "indexed phrase search diverged from the inline form")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet") && !plan.contains("text#"),
      s"indexed phrase search touched corpus text:\n$plan")
  }
}
