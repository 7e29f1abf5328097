package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Output-shaped decomposition of the kNN family's LSH mining
  * (VERDICT r14 #3): label_noise read 6.8× over-linear at sf10 with a
  * HYPOTHESIZED cause — ScaleUp's replication builds near-dup cliques
  * whose SIZE is the replication factor (each replica perturbs only
  * embedding[0]), so bucket-mate candidates grow ∝ N·clique while the
  * top-k output stays ≤ k·N.  This tool measures that shape per SF:
  * candidate pairs, verified pairs, kNN edges, output rows, and the
  * candidates-per-output-edge ratio — the minhash exoneration
  * protocol, which for minhash PROVED output growth (109×) explained
  * the time.  For kNN the output is k-bounded by construction, so a
  * growing candidates/edge ratio here is the signed confession that
  * the mining needs a per-(vec, band) candidate cap, not an
  * exoneration.
  *
  * Candidates are counted off the SAME [[Similarity.embeddingPostings]]
  * frame the operator mines, at the SAME resolved geometry as the
  * SparkEntry gate call (bands = 8, occupancy-resolved width).
  *
  * Usage: runMain graft.tools.KnnShape <sfDir> [k] [minCosine]
  * Prints one JSON line.
  */
object KnnShape {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 5
    val minCosine = if (args.length > 2) args(2).toDouble else 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println("[knnshape] shuffle partitions: " +
      graft.core.Tuning.autoShufflePartitions(spark, sfDir))

    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val n = emb.count()
    val r = Similarity.regimeRowsPerBand(n)
    val bands = 8
    // optional stage filter (4th arg): comma-separated subset of
    // cand,ver,knn,label — each stage in a FRESH run isolates it from
    // the prior stages' JVM/shuffle state
    val stages: Set[String] =
      if (args.length > 3) args(3).split(",").toSet
      else Set("cand", "ver", "knn", "label")
    // optional 5th arg: candidate cap (0 = AutoCap, -1 = uncapped)
    val cap = if (args.length > 4) args(4).toInt else Similarity.AutoCap
    val capArg = if (cap == -1) Int.MaxValue else cap

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val x = f
      (x, (System.nanoTime() - t0) / 1e9)
    }

    // stage 1: bucket-collision candidate pairs (the operator's mining
    // join, undirected distinct — identical definition to nearDupPairs)
    val banded = Similarity.embeddingPostings(
      emb.select(col("vec_id"), col("embedding")), bands, r)
    val (cand, tCand) = if (!stages("cand")) (-1L, -1.0) else timed {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct().count()
    }
    // stage 2: cosine-verified pairs at the mining threshold
    val (verified, tVer) = if (!stages("ver")) (-1L, -1.0) else timed {
      Similarity.embeddingNearDup(emb, minCosine, bands, r).count()
    }
    // stage 3: kNN edges (top-k of verified, symmetrized)
    val (edges, tEdges) = if (!stages("knn")) (-1L, -1.0) else timed {
      Similarity.knnGraph(emb, k, minCosine, bands, r, capArg).count()
    }
    // full query: label agreement output rows
    val (outRows, tOut) = if (!stages("label")) (-1L, -1.0) else timed {
      Similarity.labelAgreement(emb, k, minCosine, bands, r, capArg).count()
    }
    val perEdge = if (edges == 0) -1.0 else cand.toDouble / edges
    println(f"""{"sf_dir": "$sfDir", "n_vectors": $n, "rows_per_band": $r, """ +
      f""""candidates": $cand, "verified": $verified, "edges": $edges, """ +
      f""""label_noise_rows": $outRows, "cand_per_edge": $perEdge%.3f, """ +
      f""""sec_candidates": $tCand%.2f, "sec_verified": $tVer%.2f, """ +
      f""""sec_knn": $tEdges%.2f, "sec_label_noise": $tOut%.2f}""")
    spark.stop()
  }
}
