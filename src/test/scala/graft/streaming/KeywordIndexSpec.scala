package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Retrieval

class KeywordIndexSpec extends SparkSpec {

  private val queries = Seq(1 -> Seq("hash", "join"), 2 -> Seq("vector", "scan"))

  test("incremental index over two batches searches identically to the " +
       "inline form over the union; replay is a no-op; compact preserves " +
       "results") {
    val docs = Tables(spark, sf(), "documents")
    val Array(b1, b2) = docs.randomSplit(Array(0.5, 0.5), seed = 7)
    val dir = java.nio.file.Files.createTempDirectory("graft_kwidx").toString
    val idx = new KeywordIndex(spark, dir)

    idx.accept(b1, 0L)
    idx.accept(b2, 1L)
    assert(idx.nDocs == docs.count(), "doc count diverged from the corpus")

    val inline = Retrieval.keywordSearch(docs, queries).collect().toSeq
    assert(inline.nonEmpty)
    assert(idx.search(queries).collect().toSeq == inline,
      "indexed search diverged from inline over the same corpus")

    // at-least-once replay: batch 1 re-runs, overwrites only its own
    // partitions — index size and results unchanged
    val nPostings = idx.postings.count()
    idx.accept(b2, 1L)
    assert(idx.postings.count() == nPostings, "replay grew the index")
    assert(idx.search(queries).collect().toSeq == inline)

    // phrase search over the index == inline over the union, before
    // and after compaction
    val phrases = Seq(1 -> Seq("order", "fast"), 2 -> Seq("table", "scan"))
    val phraseInline = Retrieval.phraseSearch(docs, phrases).collect().toSeq
    assert(phraseInline.nonEmpty)
    assert(idx.phraseSearch(phrases).collect().toSeq == phraseInline,
      "indexed phrase search diverged from inline")

    // compact folds batch partitions into the seed; results identical
    idx.compact(lastCommittedBatchId = 1L)
    assert(idx.search(queries).collect().toSeq == inline,
      "compaction changed search results")
    assert(idx.phraseSearch(phrases).collect().toSeq == phraseInline,
      "compaction changed phrase results")
    assert(idx.nDocs == docs.count())
  }

  test("duplicate doc_id rows WITHIN a batch index as one version: tf " +
       "not doubled, positions unique, phrase hits preserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kwdup").toString
    val idx = new KeywordIndex(spark, dir)
    // same doc delivered twice in one batch (an upstream retry inside
    // the micro-batch) — before the in-batch dedup this doubled tf AND
    // duplicated (doc_id, term, pos) rows, which broke phraseCore's
    // n_hit === phrase_len equality and silently dropped the hit
    val batch = Seq(
      (1L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "delta alpha")).toDF("doc_id", "text")
    idx.accept(batch, 0L)
    val tf = idx.postings.filter($"term" === "alpha")
      .select($"doc_id", $"tf".cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(tf == Map(1L -> 1L, 2L -> 1L), s"tf doubled by in-batch dup: $tf")
    val pos = idx.positional.filter($"doc_id" === 1L)
      .select($"term", $"pos".cast("long")).as[(String, Long)].collect().toSeq
    assert(pos.distinct.size == pos.size && pos.size == 3,
      s"duplicate positional rows: $pos")
    val hits = idx.phraseSearch(Seq(1 -> Seq("alpha", "beta", "gamma")))
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(hits == Set(1L), s"phrase hit lost to in-batch duplication: $hits")
    assert(idx.nDocs == 2L)
  }

  test("the pipeline's optional search stage indexes CURATED text: " +
       "scrubbed PII and dropped duplicates are unfindable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_curkw").toString
    val pipe = new CurationPipeline(spark, root, gate = identity,
      indexForSearch = true)
    // DISTINCT filler per doc — a shared tail would near-dup them away
    val fillerA = (1 to 40).map(i => s"aword$i").mkString(" ")
    val fillerB = (1 to 40).map(i => s"bword$i").mkString(" ")
    val docA = s"alpha retrieval corpus $fillerA"
    val batch1 = Seq(1L -> docA,
      2L -> s"contact bob@example.com beta $fillerB").toDF("doc_id", "text")
    pipe.accept(batch1, 0L)
    // an exact re-crawl in a later batch must not land in the index
    pipe.accept(Seq(3L -> docA).toDF("doc_id", "text"), 1L)

    val idx = pipe.search.get
    assert(idx.nDocs == 2, s"index holds ${idx.nDocs} docs, want 2")
    def hits(term: String): Set[Long] = idx.search(Seq(1 -> Seq(term)))
      .select("doc_id").as[Long].collect().toSet
    assert(hits("alpha") == Set(1L), "curated doc not findable")
    assert(hits("beta") == Set(2L))
    // the raw email was scrubbed before indexing — unfindable
    assert(hits("bob@example.com").isEmpty, "PII leaked into the index")
    // phrase search rides the same curated positional frame: the
    // curated phrase hits, the scrubbed raw email never does
    def phits(ph: Seq[String]): Set[Long] = idx.phraseSearch(Seq(1 -> ph))
      .select("doc_id").as[Long].collect().toSet
    assert(phits(Seq("alpha", "retrieval", "corpus")) == Set(1L),
      "curated phrase not findable")
    assert(phits(Seq("contact", "bob@example.com")).isEmpty,
      "raw-PII phrase findable in the curated index")
  }

  test("a doc re-seen in a later batch is LAST-WRITER-WINS: old terms " +
       "unfindable, tf/df/nDocs count one version, and the resolution " +
       "survives compact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kwidx3").toString
    val idx = new KeywordIndex(spark, dir)
    idx.accept(Seq(1L -> "stale obsolete words",
      2L -> "stable neighbor").toDF("doc_id", "text"), 0L)
    // re-crawl of doc 1 with entirely new text in a later batch
    idx.accept(Seq(1L -> "fresh rewritten words").toDF("doc_id", "text"), 1L)

    assert(idx.nDocs == 2, s"re-seen doc double-counted: nDocs=${idx.nDocs}")
    def hits(term: String): Set[Long] = idx.search(Seq(1 -> Seq(term)))
      .select("doc_id").as[Long].collect().toSet
    assert(hits("stale").isEmpty, "old version's terms still findable")
    assert(hits("fresh") == Set(1L), "new version not findable")
    assert(hits("stable") == Set(2L))
    // df for the shared term counts the doc once: postings carry one
    // (doc, term) row for "words"
    assert(idx.postings.filter($"term" === "words").count() == 1,
      "re-seen doc contributes postings from both versions")
    // phrase queries see only the new version too
    def phits(ph: Seq[String]): Set[Long] = idx.phraseSearch(Seq(1 -> ph))
      .select("doc_id").as[Long].collect().toSet
    assert(phits(Seq("stale", "obsolete")).isEmpty,
      "old version's phrase still findable")
    assert(phits(Seq("fresh", "rewritten")) == Set(1L))

    // the arbitration rides a data column — folding every batch
    // partition into the seed must not resurrect the stale version
    idx.compact(lastCommittedBatchId = 1L)
    assert(hits("stale").isEmpty, "compaction resurrected the old version")
    assert(hits("fresh") == Set(1L))
    assert(idx.nDocs == 2)
  }

  test("search plans read index frames only — never the documents table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kwidx2").toString
    val idx = new KeywordIndex(spark, dir)
    idx.accept(Tables(spark, sf(), "documents"), 0L)
    val plan = idx.search(queries).queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet") && !plan.contains("text#"),
      s"search touched corpus text:\n$plan")
  }
}
