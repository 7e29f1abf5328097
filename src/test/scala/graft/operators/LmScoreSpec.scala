package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def refDocs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "the dog sat on the mat")
  ).toDF("doc_id", "text")

  test("fluent text scores lower (more probable) than unseen-gram text") {
    val lm = TextAnalysis.ngramCounts(refDocs, n = 3, minCount = 1)
    val probe = Seq(
      (10L, "the cat sat on the mat"), // every trigram in the LM
      (11L, "zx qv wp zx qv wp")       // no trigram in the LM
    ).toDF("doc_id", "text")
    val s = TextAnalysis.lmScore(probe, lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) < s(11L), s"fluent ${s(10L)} !< gibberish ${s(11L)}")
    // the gibberish doc pays exactly the unseen floor ln(1/(T+V))
    val (t, v) = lm.agg(sum("n_instances"), count(lit(1)))
      .as[(Long, Long)].head()
    assert(math.abs(s(11L) - (-math.log(1.0 / (t + v)))) < 1e-9)
  }

  test("docs shorter than n words score NULL with n_grams=0, never a silent 0") {
    val lm = TextAnalysis.ngramCounts(refDocs, n = 3, minCount = 1)
    val out = TextAnalysis.lmScore(Seq((20L, "two words")).toDF("doc_id", "text"), lm)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_grams") == 0L)
    assert(out(0).isNullAt(out(0).fieldIndex("lm_score")))
  }

  test("score is deterministic under repartitioning") {
    val docs = Tables(spark, sf(), "documents").limit(60)
    val lm = TextAnalysis.ngramCounts(docs, n = 3, minCount = 2)
    val a = TextAnalysis.lmScore(docs, lm).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.lmScore(docs.repartition(7), lm).orderBy("doc_id")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("perplexity buckets respect the score ordering and cover every doc") {
    val docs = Tables(spark, sf(), "documents").limit(200)
    val lm = TextAnalysis.ngramCounts(docs, n = 3, minCount = 2)
    val out = TextAnalysis.perplexityBuckets(docs, lm).cache()
    // scale shape: no window anywhere (cuts are aggregates, not ntile)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    assert(out.count() == 200)
    assert(out.filter(col("bucket").isNull).count() == 0)
    val byBucket = out.filter(col("lm_score").isNotNull)
      .groupBy("bucket").agg(min("lm_score").as("lo"), max("lm_score").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // every head score <= every middle score <= every tail score
    for {
      (h, m) <- byBucket.get("head").zip(byBucket.get("middle"))
    } assert(h._2 <= m._1 + 1e-12, s"head max ${h._2} > middle min ${m._1}")
    for {
      (m, t) <- byBucket.get("middle").zip(byBucket.get("tail"))
    } assert(m._2 <= t._1 + 1e-12, s"middle max ${m._2} > tail min ${t._1}")
    out.unpersist()
  }
}
