package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-3 sequence/LM operators: streaks, argmax rows, Markov
  * transitions, n-gram LM counts, vocabulary coverage, semantic dedup.
  */
class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("activityStreaks finds islands of consecutive days") {
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-02"), // dup day
      (1L, "2024-01-05"),                                          // gap
      (2L, "2024-03-10"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val out = Sessionize.activityStreaks(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("topEventPerUser picks the max-value row, ties to the smallest event_id") {
    val ev = Seq(
      (10L, 1L, "a", 5.0), (11L, 1L, "b", 9.0), (12L, 1L, "c", 9.0),
      (20L, 2L, "d", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = Sessionize.topEventPerUser(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 11L), (2L, 20L)))
  }

  test("transitions row-normalizes: per-prev probabilities sum to 1") {
    val ev = Tables(spark, sf(), "events")
    val t = Sessionize.transitions(ev)
    val sums = t.groupBy("prev_type").agg(sum("p").as("sp")).collect()
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 0.01, r.toString)
    }
    // counts conserve: total transitions = total events - users with >=1 event
    val nTrans = t.agg(sum("n")).head().getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(nTrans === nEvents - nUsers)
  }

  test("ngramCounts aggregates instances and doc frequency with the prune") {
    val docs = Seq(
      (1L, "a b c a b c"), // "a b c"×2, "b c a"×1, "c a b"×1
      (2L, "a b c d"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(docs, n = 3, minCount = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("a b c", 3L, 2L)))
  }

  test("vocabCoverage is monotone and reaches 1.0 at full vocabulary") {
    val docs = Tables(spark, sf(), "documents")
    val vocabSize = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      .select("t").distinct().count().toInt
    val out = TextAnalysis.vocabCoverage(docs, Seq(1, 5, vocabSize))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(out.map(_._1) == Seq(1L, 5L, vocabSize.toLong))
    assert(out.map(_._2) == out.map(_._2).sorted)
    assert(math.abs(out.last._2 - 1.0) < 1e-9)
  }

  test("semanticDedup drops everything except one keeper per near-dup cluster") {
    val emb = Tables(spark, sf(), "embeddings")
    val pairs = Similarity.embeddingNearDup(emb).cache()
    try {
      val dropped = Similarity.semanticDedup(emb).cache()
      try {
        val dropSet = dropped.select("vec_id").collect().map(_.getLong(0)).toSet
        val keepSet = dropped.select("keeper_id").distinct()
          .collect().map(_.getLong(0)).toSet
        // keepers are never dropped; every dropped vector appeared in a pair
        assert(keepSet.intersect(dropSet).isEmpty)
        val inPairs = pairs.select(col("vec_a").as("v")).union(
          pairs.select(col("vec_b").as("v"))).distinct()
          .collect().map(_.getLong(0)).toSet
        assert(dropSet.subsetOf(inPairs))
        // per cluster the keeper is the minimum id
        assert(dropped.filter(col("keeper_id") >= col("vec_id")).count() === 0)
      } finally dropped.unpersist()
    } finally pairs.unpersist()
  }
}
