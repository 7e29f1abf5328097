package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus pipelines: deterministic split, quality gate, components. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("trainTestSplit is deterministic and covers every doc exactly once") {
    val docs = (1L to 200L).map(i => (i, s"doc $i " + ("tok " * (i % 150).toInt)))
      .toDF("doc_id", "text")
    val a = Corpus.trainTestSplit(docs).collect()
    val b = Corpus.trainTestSplit(docs).collect()
    assert(a.toSeq == b.toSeq) // content-hash split: stable across runs
    assert(a.map(_.getAs[Long]("n_docs")).sum == 200L)
    val bySplit = a.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // 13/16 expected train share; loose bounds for a 200-doc sample
    assert(bySplit("train") > bySplit("test"))
  }

  test("qualityFilter keeps only en keeper docs above the score floor") {
    val en = "the cat and the dog of the house went to the park and the end"
    val docs = Seq(
      (1L, en),              // keeper, en, decent score
      (2L, en),              // exact dup of 1 -> dropped
      (3L, "zz!! ##")        // junk -> dropped
    ).toDF("doc_id", "text")
    val out = Corpus.qualityFilter(docs, minScore = 0.3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(out.head.getAs[String]("predicted_lang") == "en")
  }

  test("decontaminate == brute-force 8-gram containment against test set") {
    val docs = graft.core.Tables(spark, sf(), "documents")
    val clean = Corpus.decontaminate(docs).collect().map(_.getLong(0)).toSet
    // independent brute force: recompute split + gram sets driver-side
    val h = ascii(substring(md5(col("text")), 32, 1))
    val nibble = when(h <= 57, h - 48).otherwise(h - 87)
    val rows = docs.select(col("doc_id"), (nibble < 13).as("is_train"),
        TextOps.shingles(col("text"), 8).as("g")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_train"),
        r.getAs[Seq[String]]("g").toSet))
    val testGrams = rows.filter(!_._2).flatMap(_._3).toSet
    val expected = rows.filter(_._2)
      .filter(_._3.intersect(testGrams).isEmpty).map(_._1).toSet
    assert(clean == expected && clean.nonEmpty)
    assert(clean.size < rows.count(_._2)) // something was contaminated
  }

  test("connectedComponents labels every member with the component min") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    val out = Corpus.connectedComponents(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a long chain (diameter > 1 round)") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Corpus.connectedComponents(chain, "doc_a", "doc_b").collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[Long]("component_id") == 1L))
  }
}
