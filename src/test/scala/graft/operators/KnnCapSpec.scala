package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the kNN candidate cap's contract (VERDICT r14 #3): bounded
  * per-(vec, band) verify work with measured-high recall on the exact
  * regime that motivated it — factor-100 planted near-dup cliques,
  * the sf10 ScaleUp shape where uncapped bucket-mate candidates grow
  * ∝ clique² while the top-k output stays k-bounded.
  */
class KnnCapSpec extends SparkSpec {
  import spark.implicits._

  // the ScaleUp clique shape: members differ only in embedding[0], by
  // 0.001 per replica step — cosine ordering within a clique is
  // monotone in |Δrep|, exactly what the 1-D ranking projection sees
  private def cliqueCorpus(cliques: Int, size: Int, noise: Int) = {
    val rnd = new scala.util.Random(11)
    val members = (0 until cliques).flatMap { c =>
      val base = Array.fill(64)(rnd.nextFloat() - 0.5f)
      (0 until size).map { j =>
        (c * 100000L + j) -> base.zipWithIndex.map { case (x, i) =>
          if (i == 0) x + 0.001f * j else x }.toSeq
      }
    }
    val noiseVecs = (0 until noise).map { j =>
      (900000L + j) -> Array.fill(64)(rnd.nextFloat() - 0.5f).toSeq
    }
    (members ++ noiseVecs).toDF("vec_id", "embedding")
  }

  test("cap preserves neighbor quality (and ≥ 0.9 set recall) vs " +
       "uncapped mining on 100-member cliques") {
    val corpus = cliqueCorpus(cliques = 2, size = 100, noise = 50)
    def run(capped: Boolean) =
      Similarity.knnGraph(corpus, k = 5, minCosine = 0.2, bands = 8,
        rowsPerBand = Similarity.AutoWidth,
        maxCandidatesPerBand = if (capped) Similarity.AutoCap else Int.MaxValue)
        .select("vec_id", "rank", "neighbor_id", "cos_sim").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
    val (cappedM, uncappedM) = (run(capped = true), run(capped = false))
    // Quality contract: at every (vec, rank) slot the capped neighbor
    // is as similar as the uncapped one, up to one round-4 ulp — the
    // only substitutions the cap may make are among 4-decimal cosine
    // TIES (rank breaks ties by neighbor id over the candidate
    // subset, so tied-but-different ids are expected and harmless).
    uncappedM.foreach { case (slot, (_, cosU)) =>
      val cosC = cappedM.get(slot).map(_._2).getOrElse(Double.MinValue)
      assert(cosC >= cosU - 1e-4,
        s"slot $slot: capped cos $cosC < uncapped $cosU - 1e-4")
    }
    val cappedE = cappedM.toSeq.map { case ((v, _), (n, _)) => (v, n) }.toSet
    val uncappedE = uncappedM.toSeq.map { case ((v, _), (n, _)) => (v, n) }.toSet
    val recall = (cappedE & uncappedE).size.toDouble / uncappedE.size
    assert(recall >= 0.9,
      s"cap set-recall $recall (${cappedE.size} capped vs " +
        s"${uncappedE.size} uncapped edges)")
    // and the cap actually BINDS here: every clique member sees 99
    // bucket-mates per band, well over the auto cap of 40
    assert(uncappedE.nonEmpty && cappedE.size <= uncappedE.size)
  }

  test("capped ≡ uncapped when no (vec, band) bucket exceeds the cap") {
    val corpus = cliqueCorpus(cliques = 3, size = 8, noise = 60)
    def run(cap: Int) =
      Similarity.knnGraph(corpus, k = 5, minCosine = 0.2, bands = 8,
        rowsPerBand = Similarity.AutoWidth, maxCandidatesPerBand = cap)
        .collect().map(_.toSeq).toSet
    assert(run(Similarity.AutoCap) == run(Int.MaxValue),
      "8-member cliques sit far under the cap — capped and uncapped " +
        "mining must be row-identical")
  }

  test("cap below k is rejected loudly") {
    val corpus = cliqueCorpus(1, 8, 10)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraph(corpus, k = 5, maxCandidatesPerBand = 3)
    }
    assert(e.getMessage.contains("maxCandidatesPerBand"))
  }
}
