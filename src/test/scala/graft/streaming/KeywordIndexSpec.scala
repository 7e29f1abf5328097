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

    // compact folds batch partitions into the seed; results identical
    idx.compact(lastCommittedBatchId = 1L)
    assert(idx.search(queries).collect().toSeq == inline,
      "compaction changed search results")
    assert(idx.nDocs == docs.count())
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
