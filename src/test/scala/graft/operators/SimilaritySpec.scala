package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  // 4-dim toy corpus: 1 and 2 nearly parallel, 3 orthogonal, 4 opposite.
  private val corpus = vecs(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0.9f, 0.1f, 0f, 0f),
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(-1f, 0f, 0f, 0f))

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val out = Similarity.bruteForceTopK(corpus,
      corpus.filter($"vec_id" === 0L), k = 3).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getAs[Double]("cos_sim") > 0.99)
    assert(out.last.getAs[Double]("cos_sim") == -1.0)
  }

  test("embeddingNearDup finds the near-parallel pair only") {
    val out = Similarity.embeddingNearDup(corpus, minCosine = 0.9).collect()
    val pairs = out.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ivfTopK returns k ranked neighbors per probe on the real table") {
    val emb = graft.core.Tables(spark, sf(), "embeddings")
    val out = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 3), k = 5)
      .collect()
    assert(out.length == 15)
    val perProbe = out.groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.values.forall(_.map(_.getAs[Long]("rank")).toSeq
      .sorted == Seq(1L, 2L, 3L, 4L, 5L)))
  }
}
