package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization: codebook shape/determinism, Lloyd convergence,
  * code-range invariants, and an ADC recall floor vs the exact L2 scan
  * on the fixed embeddings table. PQ is float-mean based so it is
  * spec-verified rather than oracle-hashed (same stance as
  * kmeansRefine).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val K = 256

  private lazy val emb: DataFrame =
    graft.core.Tables(spark, sf(), "embeddings").select("vec_id", "embedding")
  private lazy val codebook: DataFrame = Pq.codebook(spark)
  private lazy val codes: DataFrame = Pq.codes(spark)

  test("codebook has m×k rows of dims/m floats and is deterministic") {
    val rows = codebook.collect()
    assert(rows.length == M * K)
    assert(rows.forall(_.getAs[Seq[Float]]("centroid").length == 64 / M))
    val again = Similarity.pqTrain(emb).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Int]("sub_id"), r.getAs[Int]("code"))
    assert(rows.sortBy(key).map(_.toString).toSeq ==
      again.sortBy(key).map(_.toString).toSeq)
  }

  test("Lloyd iterations do not increase the quantization error") {
    val seed = Similarity.pqTrain(emb, iters = 0)
    val e0 = Similarity.pqError(emb, seed)
    val e2 = Similarity.pqError(emb, codebook)
    assert(e2 <= e0 + 1e-9, s"error rose: seed $e0 -> refined $e2")
    assert(e2 > 0d) // random-ish corpus cannot quantize losslessly
  }

  test("codes cover every vector with m indices in [0, k)") {
    val out = codes.collect()
    assert(out.length == emb.count())
    assert(out.forall(_.getAs[Seq[Int]]("codes").length == M))
    assert(out.forall(_.getAs[Seq[Int]]("codes").forall(c => c >= 0 && c < K)))
    // the codebook is actually used: one code per subspace would mean
    // the argmin degenerated
    val distinctPerSub = codes
      .select(posexplode($"codes"))
      .groupBy($"pos").agg(countDistinct($"col").as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(distinctPerSub.forall(_ > 1))
  }

  test("ADC top-k recall vs the exact L2 scan clears the floor") {
    val probes = emb.filter($"vec_id" < 10)
    val exact = emb.as("c")
      .crossJoin(broadcast(probes.select($"vec_id".as("probe_id"),
        $"embedding".as("probe_emb"))))
      .filter($"c.vec_id" =!= $"probe_id")
      .select($"probe_id", $"c.vec_id".as("neighbor_id"),
        (Similarity.dot($"c.embedding", $"c.embedding")
          - lit(2d) * Similarity.dot($"probe_emb", $"c.embedding")
          + Similarity.dot($"probe_emb", $"probe_emb")).as("d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy($"d2".asc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select($"probe_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.pqTopK(codes, probes, codebook, k = 5)
      .select($"probe_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(approx.keySet == exact.keySet)
    assert(approx.values.forall(_.size == 5))
    val recall = exact.keys.toSeq.map(p =>
      (approx(p) & exact(p)).size.toDouble / 5).sum / exact.size
    // deterministic corpus + deterministic pipeline → stable numbers;
    // floors pinned below the measured values (0.32 / 1.00) with margin
    assert(recall >= Pq.AdcRecallFloor, f"adc recall@5 = $recall%.3f")
    val reranked = Similarity.pqShortlistTopK(emb, codes, probes, codebook,
      k = 5, shortlist = 50)
      .select($"probe_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val rerankRecall = exact.keys.toSeq.map(p =>
      (reranked(p) & exact(p)).size.toDouble / 5).sum / exact.size
    assert(rerankRecall >= Pq.RerankRecallFloor,
      f"reranked recall@5 = $rerankRecall%.3f")
    assert(rerankRecall >= recall, "re-ranking must not hurt recall")
  }

  test("native encoder matches the relational path code for code, join-free") {
    val native = Similarity.pqEncodeNative(emb, codebook)
    val byId = (df: DataFrame) => df.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Int]]("codes"))
      .toMap
    val n = byId(native); val j = byId(codes)
    assert(n.keySet == j.keySet)
    val diffs = n.keys.filter(id => n(id) != j(id))
    assert(diffs.isEmpty, s"codes diverge for vec_ids ${diffs.take(5)}")
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "native encode must not join")
    assert(!plan.contains("Exchange"), "native encode must not shuffle")
    assert(plan.contains("pq_codes"))
  }

  test("ivf-pq with exhaustive probing and full shortlist IS the exact ranking") {
    val probes = emb.filter($"vec_id" < 5)
    // 10 stride-50 cells on the 500-vector corpus; probing all of them
    // with a corpus-sized shortlist leaves re-ranking as the only
    // ranking step, so the output must equal the exact scan exactly.
    val out = Similarity.ivfPqTopK(emb, probes, k = 5,
      centroidStride = 50, nProbeCells = 10, shortlist = 500)
      .select($"probe_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == exactTop5Ranked(probes), "ivf-pq must degrade to exact search")
  }

  test("ivf-pq default-parameter recall clears the floor") {
    val probes = emb.filter($"vec_id" < 10)
    val exact = exactTop5(probes)
    val got = Similarity.ivfPqTopK(emb, probes, k = 5)
      .select($"probe_id", $"neighbor_id")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.keys.toSeq.map(p =>
      (got.getOrElse(p, Set.empty[Long]) & exact(p)).size.toDouble / 5)
      .sum / exact.size
    assert(recall >= Pq.IvfPqRecallFloor, f"ivf-pq recall@5 = $recall%.3f")
  }

  /** Exact L2 top-5 neighbor sets per probe. */
  private def exactTop5(probes: DataFrame): Map[Long, Set[Long]] =
    exactTop5Ranked(probes).groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap

  /** Exact L2 top-5 as (probe_id, rank, neighbor_id) triples. */
  private def exactTop5Ranked(probes: DataFrame): Set[(Long, Long, Long)] =
    emb.as("c")
      .crossJoin(broadcast(probes.select($"vec_id".as("probe_id"),
        $"embedding".as("probe_emb"))))
      .filter($"c.vec_id" =!= $"probe_id")
      .select($"probe_id", $"c.vec_id".as("neighbor_id"),
        (Similarity.dot($"c.embedding", $"c.embedding")
          - lit(2d) * Similarity.dot($"probe_emb", $"c.embedding")
          + Similarity.dot($"probe_emb", $"probe_emb")).as("d2"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy($"d2".asc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select($"probe_id", $"rank".cast("long"), $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("adc distances are monotone with the rank and self is excluded") {
    val out = Similarity.pqTopK(codes, emb.filter($"vec_id" === 3), codebook,
      k = 10).collect()
    assert(out.forall(_.getAs[Long]("neighbor_id") != 3L))
    val d = out.map(_.getAs[Double]("adc_d2"))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b })
  }
}

/** Shared fixtures so the (iterative, localCheckpoint-ing) training
  * runs once per suite.
  */
object Pq {
  val AdcRecallFloor = 0.2
  val RerankRecallFloor = 0.9
  // measured 0.40 at defaults: bounded by probing 2 of 10 cells (the
  // IVF coverage term — the full-shortlist test shows the PQ term
  // loses nothing), far above the 0.01 chance floor
  val IvfPqRecallFloor = 0.35
  private var cb: DataFrame = _
  private var cd: DataFrame = _
  def codebook(spark: org.apache.spark.sql.SparkSession): DataFrame =
    synchronized {
      if (cb == null) cb = Similarity.pqTrain(
        graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
          .select("vec_id", "embedding")).cache()
      cb
    }
  def codes(spark: org.apache.spark.sql.SparkSession): DataFrame =
    synchronized {
      if (cd == null) cd = Similarity.pqEncode(
        graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
          .select("vec_id", "embedding"), codebook(spark)).cache()
      cd
    }
}
