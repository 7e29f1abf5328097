package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: "good" vocabulary vs "spam" vocabulary with a
  // couple of shared neutral words
  private def labeled = Seq(
    (1L, "insightful analysis of the experiment results", 1.0),
    (2L, "careful reasoning about the method and evidence", 1.0),
    (3L, "detailed explanation of the observed results", 1.0),
    (4L, "thorough discussion of the evidence and method", 1.0),
    (5L, "buy cheap pills now click here", 0.0),
    (6L, "winner click now for free money", 0.0),
    (7L, "cheap money fast buy now", 0.0),
    (8L, "free pills winner click the link", 0.0)).toDF("doc_id", "text", "label")

  test("training loss decreases monotonically on separable data") {
    val (_, losses) = QualityModel.train(labeled, iters = 10, trace = true)
    assert(losses.size === 11)
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      s"loss not monotone: $losses")
    assert(losses.head > 0.69 && losses.head < 0.70) // ln 2 at w=0
  }

  test("trained model separates train docs completely") {
    val (model, _) = QualityModel.train(labeled, iters = 30)
    val scored = QualityModel.classify(labeled, model)
      .join(labeled.select("doc_id", "label"), "doc_id")
      .collect().map(r => (r.getAs[Double]("label"), r.getAs[Double]("p")))
    val minPos = scored.filter(_._1 == 1.0).map(_._2).min
    val maxNeg = scored.filter(_._1 == 0.0).map(_._2).max
    assert(minPos > 0.5 && maxNeg < 0.5,
      s"not separated: minPos=$minPos maxNeg=$maxNeg")
    assert(minPos - maxNeg > 0.3, "margins should be wide on separable data")
  }

  test("generalizes along shared vocabulary to unseen docs") {
    val (model, _) = QualityModel.train(labeled, iters = 30)
    val unseen = Seq(
      (100L, "careful analysis of the evidence"),
      (101L, "click now buy cheap")).toDF("doc_id", "text")
    val p = QualityModel.classify(unseen, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(p(100L) === true)
    assert(p(101L) === false)
  }

  test("model is bounded by 2^bits rows and tokenless docs still score") {
    val (model, _) = QualityModel.train(labeled, bits = 6, iters = 3)
    assert(model.weights.count() <= (1L << 6) + 1)
    // the hash width travels with the model — no bits to mismatch
    val scored = QualityModel.classify(Seq((1L, "")).toDF("doc_id", "text"),
      model)
    assert(scored.count() === 1L) // bias feature keeps empty docs scoreable
  }

  test("scoring plan is one broadcast join, no shuffle of the corpus by feat") {
    val (model, _) = QualityModel.train(labeled, iters = 1)
    val scored = QualityModel.classify(labeled, model)
    scored.collect()
    val full = scored.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full; case i => full.substring(0, i)
    }
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"model join degraded to SMJ:\n$plan")
  }
}
